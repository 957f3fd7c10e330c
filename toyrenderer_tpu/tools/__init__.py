"""Command-line tools: headless rendering, benchmarking, debugging."""
