from bergen_tpu.data.processor import Processor, ProcessDatasets  # noqa: F401
