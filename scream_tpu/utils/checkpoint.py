"""Best-metric-gated checkpointing of params + optimizer state + step.

The reference saves only ``net.state_dict()`` when the validation metric
improves, with no optimizer/epoch state and no resume
(`/root/reference/train_3d_match.py:226-230`, SURVEY.md §5). Here the full
train state (params, opt state, step) checkpoints through orbax, so training
is resumable, while keeping the same best-metric gating semantics — lower is
better for point loss / chamfer, higher for success rate.
"""

from __future__ import annotations

import os
from typing import Any, Optional



class BestCheckpointer:
    """Save train state when the watched metric improves.

    The best metric persists to ``best_metric.json`` in the directory, so a
    resumed run keeps gating against the previous best instead of letting
    its first (usually worse) validation clobber the best checkpoint.
    Non-finite metrics never save: accepting a NaN would wedge the gate
    forever (every later comparison against NaN is False).
    """

    def __init__(self, directory: str, mode: str = "min"):
        import json
        import math

        assert mode in ("min", "max")
        self.directory = os.path.abspath(directory)
        self.mode = mode
        self.best: Optional[float] = None
        os.makedirs(self.directory, exist_ok=True)
        meta = os.path.join(self.directory, "best_metric.json")
        if os.path.exists(meta):
            with open(meta) as f:
                rec = json.load(f)
            if rec.get("mode") == mode and math.isfinite(rec.get("best", float("nan"))):
                self.best = float(rec["best"])
        import orbax.checkpoint as ocp

        self._ckptr = ocp.StandardCheckpointer()

    def improved(self, metric: float) -> bool:
        import math

        if not math.isfinite(metric):
            return False
        if self.best is None:
            return True
        return metric < self.best if self.mode == "min" else metric > self.best

    def maybe_save(self, metric: float, state: Any) -> bool:
        """Save if ``metric`` beats the best so far; returns whether it saved."""
        import json

        if not self.improved(metric):
            return False
        self.best = float(metric)
        path = os.path.join(self.directory, "best")
        self._ckptr.save(path, state, force=True)
        self._ckptr.wait_until_finished()
        with open(os.path.join(self.directory, "best_metric.json"), "w") as f:
            json.dump({"best": self.best, "mode": self.mode}, f)
        return True

    def restore(self, template: Any) -> Any:
        """Restore the best checkpoint into the structure of ``template``."""
        path = os.path.join(self.directory, "best")
        return self._ckptr.restore(path, template)


def save_params(directory: str, params: Any) -> None:
    """One-shot params save (eval/export path)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(directory), params, force=True)
    ckptr.wait_until_finished()


def load_params(directory: str, template: Any) -> Any:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(directory), template)
