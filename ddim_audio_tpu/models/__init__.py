from .unet import (init_model, apply_model, apply_model_flat_io,
                   ModelConfig, count_params)

__all__ = ["init_model", "apply_model", "apply_model_flat_io",
           "ModelConfig", "count_params"]
