"""End-to-end workflows: full pipeline, split-machine stages, repair, tools."""
