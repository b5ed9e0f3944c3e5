"""Host-side utilities: image IO/decode, thumbnails, path globbing,
id->path sidecar, chunking, timing."""
