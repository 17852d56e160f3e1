from ribodetector_tpu.ops.dispatch import classify_logits

__all__ = ["classify_logits"]
