from .hf_export import export_hf_checkpoint, flax_to_hf_state_dict, hf_config_dict

__all__ = ["export_hf_checkpoint", "flax_to_hf_state_dict", "hf_config_dict"]
