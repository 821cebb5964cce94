"""Command-line drivers with reference-parity flags."""
