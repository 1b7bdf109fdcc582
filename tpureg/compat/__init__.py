from .caffe_import import assign_layer_ordered, bgr_to_rgb_first_conv
from .torch_import import (
    collapse_rgb_input,
    collapse_rgb_pair_input,
    import_torch_state_dict,
    load_torch_checkpoint,
)

__all__ = [
    "assign_layer_ordered",
    "bgr_to_rgb_first_conv",
    "collapse_rgb_input",
    "collapse_rgb_pair_input",
    "import_torch_state_dict",
    "load_torch_checkpoint",
]
