from .syn import apply_flow, register_syn

__all__ = ["register_syn", "apply_flow"]
