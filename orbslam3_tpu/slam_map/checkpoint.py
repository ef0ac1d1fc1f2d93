"""Map checkpoint / resume (atlas save & load).

Parity target: upstream ORB-SLAM3 V1.0 atlas save/load (removed by the
fork — SURVEY §5.4; serialization fields remain in
include/KeyFrame.h:304-330 etc.).  Here the whole MapState is a pytree of
arrays, so checkpointing is a single orbax save; per-KF feature frames
(needed to re-seed matching after resume) ride along.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np

from . import state as mapstate


def _to_numpy_tree(tree: Any):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_map(path: str, m: mapstate.MapState) -> None:
    """Save the map to `path` (.npz)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    flat = {f"map__{k}": np.asarray(v) for k, v in m._asdict().items()}
    np.savez_compressed(path, **flat)


def load_map(path: str) -> mapstate.MapState:
    """Load a MapState saved by save_map."""
    z = np.load(path, allow_pickle=False)
    fields = {}
    rebuild = []
    for name in mapstate.MapState._fields:
        key = f"map__{name}"
        if key in z:
            fields[name] = jax.numpy.asarray(z[key])
        else:
            # field added after this checkpoint was written: derive it
            rebuild.append(name)
            fields[name] = None
    if rebuild and rebuild != ["pt_kf_mask"]:
        raise KeyError(f"checkpoint missing non-derivable fields {rebuild}")
    if rebuild:
        P = fields["pt_xyz"].shape[0]
        K = fields["kf_R"].shape[0]
        fields["pt_kf_mask"] = jax.numpy.zeros((P, K), bool)
        return mapstate.rebuild_incidence(mapstate.MapState(**fields))
    return mapstate.MapState(**fields)


def save_system(path: str, system) -> None:
    """Checkpoint a System: map + per-KF features/bindings + tracker pose."""
    extras = {}
    for k, ff in system.kf_features.items():
        extras[f"ff_{k}"] = {f: np.asarray(getattr(ff, f))
                             for f in ff._fields}
    for k, b in system.kf_bindings.items():
        extras[f"bind_{k}"] = np.asarray(b)
    extras["R_cur"] = np.asarray(system.R_cur)
    extras["t_cur"] = np.asarray(system.t_cur)
    flat = {f"map__{k}": np.asarray(v)
            for k, v in system.map._asdict().items()}
    import pickle
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez_compressed(path, **flat)
    with open(path + ".extras.pkl", "wb") as f:
        pickle.dump(extras, f)


def load_system(path: str, system) -> None:
    """Restore a System checkpoint in place."""
    import pickle
    from ..features.extractor import FeatureFrame
    system.map = load_map(path)
    with open(path + ".extras.pkl", "rb") as f:
        extras = pickle.load(f)
    import jax.numpy as jnp
    for key, val in extras.items():
        if key.startswith("ff_"):
            k = int(key[3:])
            system.kf_features[k] = FeatureFrame(
                **{f: jnp.asarray(v) for f, v in val.items()})
        elif key.startswith("bind_"):
            system.kf_bindings[int(key[5:])] = jnp.asarray(val)
    system.R_cur = jnp.asarray(extras["R_cur"])
    system.t_cur = jnp.asarray(extras["t_cur"])
    system.R_prev, system.t_prev = system.R_cur, system.t_cur
    system.has_velocity = False
    system.last_kf_idx = int(system.map.n_kf) - 1
    # resync the HOST mirrors (keyframe insertion trusts them — stale
    # zeros would overwrite live keyframe slots on the next insert)
    system.n_kf_host = int(system.map.n_kf)
    system.last_kf_ts = float(system.map.kf_ts[system.last_kf_idx]) \
        if system.n_kf_host else 0.0
    system._prev_frame_ts = None
    from ..pipeline.system import OK
    system.state = OK if system.n_kf_host >= 2 else system.state
    # rebuild the device feature bank from the restored dicts
    system.bank = None
    for k, f in system.kf_features.items():
        b = system.kf_bindings.get(k)
        if b is not None:
            system._bank_store(k, f, b)
    # rebuild the place-recognition database (reference LoadAtlas
    # re-encodes every KeyFrame's BoW into the KeyFrameDatabase —
    # src serialization path; without this a restored session can
    # neither relocalize nor close loops against the loaded map)
    if system.loop_closer is not None:
        from ..place import keyframe_db as kdb
        lc = system.loop_closer
        lc.db = kdb.KeyframeDB.create(lc.db.tf.shape[0], lc.cfg.n_words)
        lc.consistent_groups = []
        for k, f in system.kf_features.items():
            lc.add_keyframe(system.map, k, f)
    # refresh the bounded tracking view against the restored map
    if system.cfg.local_view_points > 0 and system.n_kf_host:
        system._refresh_view()
