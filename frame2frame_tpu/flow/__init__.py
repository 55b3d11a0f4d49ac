from .api import orun, precompute_flo_files, run_flows
from .tvl1 import (
    DENOISING_PARAMS,
    MAX_ITERATIONS,
    make_batched_tvl1,
    make_tvl1_solver,
    tvl1_flow,
)
