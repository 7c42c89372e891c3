"""Guidance-function wrapper whose weights travel as jit ARGUMENTS.

A jitted program that closes over a large parameter pytree embeds the
weights as constants in the lowered computation -- for DPT-large that
is ~0.7 GB of HLO literals, which bloats executables, defeats donation,
and overflows remote-compile payload limits. ``GuidanceFn`` keeps the
weights OUT of the closure: the depth pipeline receives ``fn.params``
as a traced argument (``depth_batch_pipeline(..., guidance_params=...)``)
and calls ``fn(left[, right], params=params)``.

Plain closures remain supported for tests/custom backends: when
``guidance_params`` is None the callable is invoked without a params
argument and may close over whatever it likes.
"""

from __future__ import annotations

from typing import Any, Callable


class GuidanceFn:
    """Callable guidance backend with explicit parameters.

    ``apply_fn(params, left)`` for monocular backends;
    ``apply_fn(params, left, right)`` when ``stereo=True``.
    Hashable by identity, so it is a valid jit static argument; the
    params pytree rides alongside as a normal traced argument.
    """

    def __init__(self, apply_fn: Callable, params: Any,
                 stereo: bool = False):
        self._apply = apply_fn
        self.params = params
        self.stereo = stereo

    def __call__(self, left, right=None, params=None):
        p = self.params if params is None else params
        if self.stereo:
            return self._apply(p, left, right)
        return self._apply(p, left)
