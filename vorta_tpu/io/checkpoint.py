"""Router-only checkpoints (orbax).

The reference saves only the router parameters + optimizer state under
``ckpt/step-%06d/`` and resolves ``--resume latest`` by scanning step dirs
(vorta/train/checkpoint.py:23-48, vorta/utils/misc.py:52-65).  Same layout
here, with orbax instead of torch.save: ``step-XXXXXX/router`` and
``step-XXXXXX/optimizer`` PyTree checkpoints.
"""

from __future__ import annotations

import re
from pathlib import Path
from typing import Any, Optional, Tuple

import jax
import orbax.checkpoint as ocp


def _step_dir(ckpt_dir: Path, step: int) -> Path:
    return ckpt_dir / f"step-{step:06d}"


def _to_plain(tree: Any) -> dict:
    """Any pytree (nnx.State, optax namedtuples, ...) -> flat dict of leaves.

    orbax round-trips plain dicts losslessly; exotic pytree nodes come back
    as lists/dicts, so we serialize leaves only and rebuild the structure
    from a template at load time."""
    leaves = jax.tree.leaves(tree)
    return {f"leaf_{i:05d}": x for i, x in enumerate(leaves)}


def save_router_checkpoint(
    ckpt_dir, step: int, router_state: Any, opt_state: Any = None
) -> Path:
    path = _step_dir(Path(ckpt_dir).absolute(), step)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path / "router", _to_plain(router_state))
        if opt_state is not None:
            ckptr.save(path / "optimizer", _to_plain(opt_state))
    return path


def load_router_checkpoint(
    path, router_template: Any, opt_template: Any = None
) -> Tuple[Any, Any]:
    """Restore (router_state, opt_state or None) from a step dir."""
    path = Path(path).absolute()

    def _restore(ckptr, p, template):
        plain = _to_plain(template)
        raw = ckptr.restore(
            p, restore_args=ocp.checkpoint_utils.construct_restore_args(plain)
        )
        leaves = [raw[k] for k in sorted(raw)]
        return jax.tree.unflatten(jax.tree.structure(template), leaves)

    with ocp.PyTreeCheckpointer() as ckptr:
        router = _restore(ckptr, path / "router", router_template)
        opt = None
        if opt_template is not None and (path / "optimizer").exists():
            opt = _restore(ckptr, path / "optimizer", opt_template)
    return router, opt


def latest_checkpoint(ckpt_dir) -> Optional[Path]:
    """Resolve the newest step dir, or None (reference parent_to_ckpt_dir)."""
    ckpt_dir = Path(ckpt_dir)
    if not ckpt_dir.exists():
        return None
    best = None
    best_step = -1
    for p in ckpt_dir.iterdir():
        m = re.fullmatch(r"step-(\d+)", p.name)
        if m and int(m.group(1)) > best_step:
            best_step = int(m.group(1))
            best = p
    return best
