"""CLI entry points mirroring the reference scripts' flags and outputs."""
