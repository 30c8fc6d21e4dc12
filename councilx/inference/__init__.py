"""Inference: batched translation + folder CLI (reference test_on_folder.py)."""

from councilx.inference.translate import Translator  # noqa: F401
