"""Table sources/sinks: driver testdata readers + the images payload table."""
