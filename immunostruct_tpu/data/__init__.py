from immunostruct_tpu.data.encoding import (
    AMINO_ACIDS, PADDING_CHAR, pad_sequence, one_hot_encode,
    one_hot_encode_batch, AA3_TO_1, RESIDUE_ONEHOT_INDEX,
)
from immunostruct_tpu.data.tables import (
    get_hash, parse_property_table, parse_property_tables_cancer_wt,
    expand_hla, dedup_property_df,
)
from immunostruct_tpu.data.graphs import (
    GraphCorpus, load_graph_dir, graph_key_from_name,
)
from immunostruct_tpu.data.dataset import (
    ImmunoDataset, ComparativeDataset, ClinicalDataset, seeded_split,
)
from immunostruct_tpu.data.pipeline import BatchPipeline, ComparativePipeline
from immunostruct_tpu.data.synthetic import (
    synthetic_corpus, synthetic_comparative_corpus, synthetic_clinical_corpus,
)
