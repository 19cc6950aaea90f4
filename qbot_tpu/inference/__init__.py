"""Inference layer: SMC particle ensembles + HMC/NUTS over gate angles."""
from qbot_tpu.inference.hmc import (
    HMCState,
    dual_averaging_warmup,
    hmc_init,
    hmc_step,
    make_circuit_log_prob,
    run_hmc,
    run_hmc_chains,
)
from qbot_tpu.inference.nuts import (
    NutsStats,
    nuts_step,
    nuts_warmup,
    run_nuts,
    run_nuts_chains,
)
from qbot_tpu.inference.smc import (
    Ensemble,
    branch,
    effective_sample_size,
    from_probs,
    lift_vmap,
    mix_to_density,
    normalize,
    resample_if_needed,
    systematic_resample,
    to_probval,
)

__all__ = [
    "HMCState", "dual_averaging_warmup", "hmc_init", "hmc_step",
    "make_circuit_log_prob", "run_hmc", "run_hmc_chains",
    "NutsStats", "nuts_step", "nuts_warmup", "run_nuts", "run_nuts_chains",
    "Ensemble", "branch", "effective_sample_size", "from_probs", "lift_vmap",
    "mix_to_density", "normalize", "resample_if_needed",
    "systematic_resample", "to_probval",
]
