from seggroup_tpu.eval.semantic import confusion_matrix, miou_from_confusion
