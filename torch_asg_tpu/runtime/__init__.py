from .host import (
    collapse_path,
    encode_labels_np,
    encode_targets,
    has_native_runtime,
    pack_frames,
)

__all__ = [
    "pack_frames",
    "encode_targets",
    "encode_labels_np",
    "collapse_path",
    "has_native_runtime",
]
