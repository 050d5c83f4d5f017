from .anomali import (  # noqa: F401
    AdaptiveBatchWriter,
    FileBackedAnomaliApi,
    TokenBucket,
    upload_payload_bisecting,
    write_intelligence,
    write_tipreport_upserts,
)
