from .lengths import default_lengths, label_mask, mask_emissions, time_mask

__all__ = ["time_mask", "label_mask", "mask_emissions", "default_lengths"]
