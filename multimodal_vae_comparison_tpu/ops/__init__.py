from multimodal_vae_comparison_tpu.ops.fusion import (
    product_of_experts,
    poe_precision_fusion,
    mixture_component_selection,
    subset_lattice,
)
