"""Command-line layer (reference: per-module ``main()``s + console scripts).

One module per tool -- align, depth, upscale, run_pipeline,
extract_aligned -- with argparse surfaces mirroring the reference's flags
(SURVEY.md SS2.1), minus the interactive ``input()`` gates
(SURVEY.md SS2.4-11: replaced by ``--yes`` / threshold flags) and with
console-script entry points that actually resolve (SS2.4-1/2).
"""
