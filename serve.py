#!/usr/bin/env python
"""Batched translation server shim:

    python serve.py --config ... --checkpoint ... --member 0 [--port 8766]

The implementation lives in councilx.cli.serve (installed entry point:
``councilx-serve``); helpers are re-exported here for their historical
import sites.
"""

from councilx.cli.serve import (  # noqa: F401
    build_engine, main, make_handler, preprocess_bytes)

if __name__ == "__main__":
    main()
