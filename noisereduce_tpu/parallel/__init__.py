from noisereduce_tpu.parallel.chunking import (
    process_chunked,
    extract_chunks,
    assemble_chunks,
    n_chunks_for,
)
