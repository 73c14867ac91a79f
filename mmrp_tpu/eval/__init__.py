from mmrp_tpu.eval import metrics  # noqa: F401
