from avcer_tpu.core import config, registry  # noqa: F401
