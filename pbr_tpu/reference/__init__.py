from pbr_tpu.reference.cpu import render_cpu  # noqa: F401
