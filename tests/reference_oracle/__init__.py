from tests.reference_oracle.oracle import (  # noqa: F401
    OracleSketcher, OracleGCNConv, OraclePredictor, OracleELPH, OracleBUDDY,
    oracle_gcn_norm, predictor_params_to_flax, elph_params_to_flax,
    buddy_params_to_flax,
)
