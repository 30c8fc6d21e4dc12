#!/usr/bin/env python
"""Training CLI shim — the reference's flat-script workflow:

    python train.py --config configs/male2female_council_folder.yaml ...

The implementation lives in councilx.cli.train (installed entry point:
``councilx-train``). See that module for the full flag list.
"""

from councilx.cli.train import main

if __name__ == "__main__":
    main()
