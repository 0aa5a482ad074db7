from .scheduler import (
    EulerDiscreteScheduler,
    SchedulerState,
    karras_sigmas,
    training_sigma_table,
    sigma_to_timestep,
    scale_model_input,
    add_noise,
    euler_step,
    edm_scalings,
)

__all__ = [
    "EulerDiscreteScheduler",
    "SchedulerState",
    "karras_sigmas",
    "training_sigma_table",
    "sigma_to_timestep",
    "scale_model_input",
    "add_noise",
    "euler_step",
    "edm_scalings",
]
