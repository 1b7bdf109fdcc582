from .torch_import import (
    collapse_rgb_pair_input,
    collapse_rgb_input,
    import_torch_state_dict,
    load_torch_checkpoint,
)

__all__ = [
    "collapse_rgb_pair_input",
    "collapse_rgb_input",
    "import_torch_state_dict",
    "load_torch_checkpoint",
]
