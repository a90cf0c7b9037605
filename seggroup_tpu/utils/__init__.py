from seggroup_tpu.utils.logging import IOStream, format_class_iou_table
from seggroup_tpu.utils.checkpoint import CheckpointManager
