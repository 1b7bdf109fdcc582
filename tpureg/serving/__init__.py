"""Serving layer: AOT-exported registration artifacts."""

from .export import (
    export_registration,
    load_artifact,
    save_artifact,
)

__all__ = ["export_registration", "save_artifact", "load_artifact"]
