"""Console entry points (pyproject [project.scripts]):

    councilx-train      — training loop (reference train.py CLI)
    councilx-translate  — batched folder inference (reference test_on_folder)
    councilx-serve      — production batching HTTP server
    councilx-gui        — interactive web demo (reference test_gui)
    councilx-convert-pt — reference gen_*.pt -> councilx .npz converter
    councilx-eval       — one-command checkpoint -> FID/KID evaluation

The repo-root scripts (train.py, test_on_folder.py, serve.py, gui.py) are
thin shims over these modules, kept so the reference's flat-script workflow
(``python train.py --config ...``) works from a source checkout unchanged.
"""
