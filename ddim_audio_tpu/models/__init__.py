from .unet import init_model, apply_model, ModelConfig, count_params

__all__ = ["init_model", "apply_model", "ModelConfig", "count_params"]
