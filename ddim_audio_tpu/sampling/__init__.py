from .ddim import ddim_coefficients, ddim_step
from .ddpm import ddpm_coefficients, ddpm_step
from .driver import ScanSampler, selected_steps

__all__ = [
    "ddim_coefficients",
    "ddim_step",
    "ddpm_coefficients",
    "ddpm_step",
    "ScanSampler",
    "selected_steps",
]
