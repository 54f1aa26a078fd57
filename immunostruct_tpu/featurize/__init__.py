from immunostruct_tpu.featurize.pdb import parse_pdb_ca
from immunostruct_tpu.featurize.edges import build_edges, EdgeConfig
from immunostruct_tpu.featurize.builder import (
    featurize_pdb, featurize_directory, RESIDUE_HBOND_DONORS, RESIDUE_HBOND_ACCEPTORS,
)
