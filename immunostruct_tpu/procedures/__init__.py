from immunostruct_tpu.procedures.metrics import (
    mean_ppvn, find_optimal_threshold, evaluate_metrics,
    roc_curve, roc_auc_score, precision_recall_auc,
)
from immunostruct_tpu.procedures.clinical import (
    kaplan_meier, logrank_test, clinical_pvalues,
)
from immunostruct_tpu.procedures.train import (
    TrainState, Trainer, train_model, train_model_comparative,
    train_model_SSL, train_model_comparative_SSL,
)
from immunostruct_tpu.procedures.infer import (
    inference, inference_comparative, inference_SSL,
    inference_comparative_SSL, inference_clinical_only,
)
