"""Experiment directory layout, logging, and resume discovery.

Reproduces the reference's exp management (trainer/train_material.py:62-94):

    <exps_root>/<Stage>-<expname>/<timestamp>/
        plots/
        checkpoints/ModelParameters/           (orbax checkpoints here)
        runconf.conf                           (config snapshot)
        <tensorboard event files>

plus `--is_continue [--timestamp]` resume discovery (exp_runner.py:37-42) and
the global seed (666, train_material.py:87-89).
"""

from __future__ import annotations

import datetime
import os
import shutil
from typing import Optional

import numpy as np


class ExperimentDir:
    def __init__(
        self,
        exps_root: str,
        stage: str,
        expname: str,
        is_continue: bool = False,
        timestamp: Optional[str] = None,
        conf_path: Optional[str] = None,
    ):
        self.base = os.path.join(exps_root, f"{stage}-{expname}")
        if is_continue:
            if timestamp in (None, "latest"):
                stamps = sorted(os.listdir(self.base)) if os.path.isdir(self.base) else []
                if not stamps:
                    raise FileNotFoundError(f"nothing to continue in {self.base}")
                timestamp = stamps[-1]
            self.timestamp = timestamp
            self.continued = True
        else:
            self.timestamp = datetime.datetime.now().strftime("%Y_%m_%d_%H_%M_%S")
            self.continued = False

        self.root = os.path.join(self.base, self.timestamp)
        self.plots_dir = os.path.join(self.root, "plots")
        self.checkpoints_dir = os.path.join(self.root, "checkpoints", "ModelParameters")
        os.makedirs(self.plots_dir, exist_ok=True)
        os.makedirs(self.checkpoints_dir, exist_ok=True)
        if conf_path and os.path.exists(conf_path):
            shutil.copy(conf_path, os.path.join(self.root, "runconf.conf"))

    def writer(self):
        """tensorboardX SummaryWriter rooted at the exp dir (reference :81-82)."""
        try:
            from tensorboardX import SummaryWriter

            return SummaryWriter(self.root)
        except Exception:  # tensorboard optional in minimal images
            class _Null:
                def add_scalar(self, *a, **k):
                    pass

                def close(self):
                    pass

            return _Null()


def seed_everything(seed: int = 666):
    """The reference seeds torch/np/random with 666 (train_material.py:87-89);
    here numpy + a root jax PRNG key."""
    import random

    import jax

    np.random.seed(seed)
    random.seed(seed)
    return jax.random.PRNGKey(seed)
