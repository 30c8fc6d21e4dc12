#!/usr/bin/env python
"""Folder inference CLI shim — the reference's flat-script workflow:

    python test_on_folder.py --config ... --checkpoint ... \
        --input_folder in/ --output_folder out/

The implementation lives in councilx.cli.translate (installed entry point:
``councilx-translate``). ``load_generator_params`` moved to
councilx.ckpt.manager; re-exported here for its historical import site.
"""

from councilx.ckpt.manager import load_generator_params  # noqa: F401
from councilx.cli.translate import main

if __name__ == "__main__":
    main()
