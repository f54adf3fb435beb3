from m3p_tpu.data.masking import MaskingConfig, mask_tokens, mask_regions
