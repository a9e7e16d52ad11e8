from bergen_tpu.serve.engine import GenerationServer  # noqa: F401
