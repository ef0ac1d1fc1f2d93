"""Pretrain the place-recognition codebook (binary k-means over real ORB
descriptors from synthetic textured worlds).

The reference ships a 1M-leaf DBoW2 tree trained offline on real imagery
(Thirdparty/DBoW2/include/DBoW2/TemplatedVocabulary.h:135); this is the
TPU build's equivalent trainer: it renders many random textured-plane
views, extracts REAL ORB descriptors with the production front-end, and
refines the seed codebook with k-majority iterations
(place/vocab.kmeans_refine).  Output: orbslam3_tpu/data/vocab_4096.npy,
loaded by default by LoopCloser.

Run on CPU:  JAX_PLATFORMS=cpu python tools/train_vocab.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def main(n_words: int = 4096, n_views: int = 48, seed: int = 0,
         cpu: bool = True):
    import jax
    if cpu:
        # env vars alone are overridden by the axon plugin (CLAUDE.md)
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from orbslam3_tpu.features.extractor import OrbParams, extract_jit
    from orbslam3_tpu.place import vocab as vocab_mod
    from orbslam3_tpu.utils import synth_render as sr

    rng = np.random.default_rng(seed)
    p = OrbParams(n_features=800, n_levels=4)
    K4 = jnp.asarray([458.654, 457.296, 367.215, 248.375], jnp.float32)
    hw = (480, 752)

    descs, valids = [], []
    for i in range(n_views):
        if i % 12 == 0:
            tex = sr.block_texture(rng, block=int(rng.integers(5, 12)))
        R_cw, t_cw = sr.look_down_pose(
            float(rng.uniform(0, 8)), float(rng.uniform(0, 8)),
            float(rng.uniform(3, 7)), yaw=float(rng.uniform(0, 6.28)),
            tilt=float(rng.uniform(-0.25, 0.25)))
        img = sr.render_plane(R_cw, t_cw, np.asarray(K4), hw, tex)
        img += rng.normal(0, 2.0, img.shape).astype(np.float32)
        ff = extract_jit(jnp.asarray(np.clip(img, 0, 255)), p)
        descs.append(np.asarray(ff.desc))
        valids.append(np.asarray(ff.valid))
        print(f"view {i}: {int(valids[-1].sum())} descriptors")

    desc = jnp.asarray(np.concatenate(descs))
    valid = jnp.asarray(np.concatenate(valids))
    print(f"total descriptors: {int(valid.sum())}")
    cb = jnp.asarray(vocab_mod.seed_codebook(n_words))
    cb = vocab_mod.kmeans_refine(cb, desc, valid, iters=8)
    out = os.path.join(os.path.dirname(__file__), "..",
                       "orbslam3_tpu", "data", f"vocab_{n_words}.npy")
    np.save(out, np.asarray(cb))
    # report word-usage entropy as a sanity metric
    words = np.asarray(vocab_mod.assign_words(desc, cb))[np.asarray(valid)]
    hist = np.bincount(words, minlength=n_words).astype(np.float64)
    pmf = hist / hist.sum()
    ent = -(pmf[pmf > 0] * np.log2(pmf[pmf > 0])).sum()
    print(f"saved {out}; word entropy {ent:.2f} bits "
          f"(max {np.log2(n_words):.2f}), used {np.sum(hist > 0)} words")


if __name__ == "__main__":
    main()
