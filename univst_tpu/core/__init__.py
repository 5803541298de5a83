"""Core math: schedulers, AdaIN ops, configs, trajectory store, PRNG discipline."""

from univst_tpu.core.scheduler import (  # noqa: F401
    DDIMConfig,
    DDIMSchedule,
    FlowMatchConfig,
    FlowMatchSchedule,
    EasyInvConfig,
    calculate_shift,
    generate_eta_values,
)
from univst_tpu.core.adain import (  # noqa: F401
    attention_adain,
    attention_adain_sd3,
    latent_adain,
    latent_adain_sd3,
)
