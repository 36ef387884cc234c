"""Command line interface for pyANI-plus-TPU.

Mirrors the reference's public command surface (public_cli.py: anim,
dnadiff, anib, animinimap2, fastani, skani, sourmash, external-alignment,
resume, list-runs, delete-run, export-run, plot-run, plot-run-comp,
classify) on click instead of typer.
"""
