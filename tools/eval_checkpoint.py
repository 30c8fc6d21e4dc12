#!/usr/bin/env python
"""One-command checkpoint -> FID/KID evaluation — shim over
councilx.cli.eval (installed entry point: ``councilx-eval``):

    python tools/eval_checkpoint.py --config C --checkpoint K \
        --input_folder testA/ --target_folder testB/ --weights inception.npz
"""

from councilx.cli.eval import main, translated_feature_batches  # noqa: F401

if __name__ == "__main__":
    main()
