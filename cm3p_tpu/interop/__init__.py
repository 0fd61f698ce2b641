from .hf_export import export_hf_checkpoint, flax_to_hf_state_dict, hf_config_dict
from .hf_import import convert_cm3p_state_dict, hf_config_to_cm3p, load_hf_checkpoint

__all__ = [
    "export_hf_checkpoint",
    "flax_to_hf_state_dict",
    "hf_config_dict",
    "convert_cm3p_state_dict",
    "hf_config_to_cm3p",
    "load_hf_checkpoint",
]
