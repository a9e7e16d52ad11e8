from bergen_tpu.serve.engine import GenerationServer  # noqa: F401
from bergen_tpu.serve.paged import PagedGenerationServer  # noqa: F401
