from .caffe_import import assign_layer_ordered, bgr_to_rgb_first_conv
from .caffe_reader import (
    CAFFE_NETS,
    caffe_layers,
    caffe_weights_biases,
    read_caffemodel,
)
from .torch_export import export_to_torch_checkpoint, export_torch_state_dict
from .torch_import import (
    collapse_rgb_input,
    collapse_rgb_pair_input,
    import_torch_state_dict,
    load_torch_checkpoint,
)

__all__ = [
    "CAFFE_NETS",
    "assign_layer_ordered",
    "bgr_to_rgb_first_conv",
    "caffe_layers",
    "caffe_weights_biases",
    "read_caffemodel",
    "collapse_rgb_input",
    "collapse_rgb_pair_input",
    "export_to_torch_checkpoint",
    "export_torch_state_dict",
    "import_torch_state_dict",
    "load_torch_checkpoint",
]
