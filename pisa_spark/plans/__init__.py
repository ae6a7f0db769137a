"""End-to-end pipelines: index build, checkpoint/resume manifest."""
