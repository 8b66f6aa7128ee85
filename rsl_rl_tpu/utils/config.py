"""YAML training-config loading.

The reference has no config system — downstream repos parse YAML into the
nested dict the runner consumes (schema documented by
config/example_config.yaml, reference config/example_config.yaml:1-77). This
helper does that parse so a training script is two lines::

    train_cfg = load_train_cfg("config/example_config.yaml")
    OnPolicyRunner(env, train_cfg, log_dir).learn(train_cfg["max_iterations"])
"""

from __future__ import annotations

import yaml


def load_train_cfg(path: str) -> dict:
    """Load a YAML config file and return the runner config dict.

    Accepts both layouts: a top-level ``runner:`` block (our example config)
    or the runner keys at the root.
    """
    with open(path) as f:
        cfg = yaml.safe_load(f)
    if not isinstance(cfg, dict):
        raise ValueError(f"Config file {path} did not parse to a mapping.")
    return cfg.get("runner", cfg)
