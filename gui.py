#!/usr/bin/env python
"""Interactive translation demo shim:

    python gui.py --config ... --checkpoint ... --input_folder in/

The implementation lives in councilx.cli.gui (installed entry point:
``councilx-gui``).
"""

from councilx.cli.gui import main

if __name__ == "__main__":
    main()
