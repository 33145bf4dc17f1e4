from twinvoice_tpu.utils.tracing import StageTimer, trace_span, get_timer
from twinvoice_tpu.utils.errors import (
    PipelineError,
    QrDecodeError,
    SegmentationError,
    OcrEngineError,
    StorageError,
    FailureLog,
)
