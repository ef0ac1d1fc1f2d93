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
    """Checkpoint a System: map + per-KF features/bindings + tracker pose.

    Inertial sessions additionally carry the IMU tracker state and the
    preintegration chain's RAW measurement buffers (the analogue of the
    reference's KeyFrame serialization backup fields
    mBackupImuPreintegrated / bias backups, include/KeyFrame.h:304-330):
    factors are REPLAYED from the raw buffers at restore time, so a
    restored session can keep culling/reintegrating exactly like a live
    one."""
    extras = {}
    for k, ff in system.kf_features.items():
        extras[f"ff_{k}"] = {f: np.asarray(getattr(ff, f))
                             for f in ff._fields}
    for k, b in system.kf_bindings.items():
        extras[f"bind_{k}"] = np.asarray(b)
    for k, u in system.kf_ur.items():
        extras[f"ur_{k}"] = np.asarray(u)
    extras["R_cur"] = np.asarray(system.R_cur)
    extras["t_cur"] = np.asarray(system.t_cur)
    # frame counters: without them a restored session restarts at
    # frame_id 0 against a map stamped with large kf_frame_id /
    # pt_first_frame values — point-culling ages go negative and mature
    # points lose their "kept permanently" protection
    extras["frame_id"] = int(system.frame_id)
    extras["last_kf_id"] = int(system.last_kf_id)
    if hasattr(system, "preint_raw"):      # InertialSystem & subclasses
        extras["inertial"] = {
            "bias": np.asarray(system.bias),
            "vel": np.asarray(system.vel),
            "imu_initialized": bool(system.imu_initialized),
            "viba1_done": bool(system.viba1_done),
            "viba2_done": bool(system.viba2_done),
            "kf_time0": system.kf_time0,
            "last_frame_ts": system.last_frame_ts,
            "preint_kf_pairs": list(system.preint_kf_pairs),
            "preint_raw": [(np.asarray(a), np.asarray(g), np.asarray(d))
                           for (a, g, d) in system.preint_raw],
            "kf_imu_buffer": [(float(t), np.asarray(g), np.asarray(a))
                              for (t, g, a) in system.kf_imu_buffer],
            "imu_queue": [(float(t), np.asarray(g), np.asarray(a))
                          for (t, g, a) in system.imu_queue],
        }
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
        elif key.startswith("ur_"):
            system.kf_ur[int(key[3:])] = jnp.asarray(val)
    system.R_cur = jnp.asarray(extras["R_cur"])
    system.t_cur = jnp.asarray(extras["t_cur"])
    system.R_prev, system.t_prev = system.R_cur, system.t_cur
    system.has_velocity = False
    system.frame_id = int(extras.get("frame_id", system.frame_id))
    system.last_kf_id = int(extras.get("last_kf_id", system.last_kf_id))
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
            system._bank_store(k, f, b, ur=system.kf_ur.get(k))
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
    # inertial tracker state + preintegration chain (reference
    # KeyFrame.h:304-330 serialization backups): factors are replayed
    # from the raw buffers at the restored bias — the restored session
    # continues WITHOUT a scale re-initialization
    iner = extras.get("inertial")
    if iner is not None and hasattr(system, "preint_raw"):
        system.bias = jnp.asarray(iner["bias"])
        system.vel = jnp.asarray(iner["vel"])
        system.imu_initialized = iner["imu_initialized"]
        system.viba1_done = iner["viba1_done"]
        system.viba2_done = iner["viba2_done"]
        system.kf_time0 = iner["kf_time0"]
        system.last_frame_ts = iner["last_frame_ts"]
        system.preint_kf_pairs = [tuple(p) for p in iner["preint_kf_pairs"]]
        system.preint_raw = [(a, g, d) for (a, g, d) in iner["preint_raw"]]
        system.preints = [system._preint_raw(a, g, d, system.bias)
                          for (a, g, d) in system.preint_raw]
        system.kf_imu_buffer = [(t, g, a)
                                for (t, g, a) in iner["kf_imu_buffer"]]
        system.imu_queue = [(t, g, a) for (t, g, a) in iner["imu_queue"]]
        system.last_body = system._cam_to_body(system.R_cur, system.t_cur)
        system.frame_prior = None
        system._frame_rows = None
        system._map_updated = True
    # refresh the bounded tracking view against the restored map
    if system.cfg.local_view_points > 0 and system.n_kf_host:
        system._refresh_view()
