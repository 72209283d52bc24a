"""CPU analysis: contiguity of per-block candidate clusters in id order.

If a block's candidate set decomposes into few contiguous id RUNS (the
median-split order is spatial, so nearby clusters have nearby ids), the
sweep can load whole runs with contiguous dynamic slices instead of
gathered rows, and extraction can emit (start, len) runs instead of k
individual ids. This measures the run statistics on the real bench scene.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp  # noqa: F401

    from __graft_entry__ import _demo_scene
    from path_tracer_ai_tpu.accel.clusters import build_clusters
    from scripts.perf_probe_r2 import make_waves

    scene, _ = _demo_scene(subdivisions=6)
    n = 1 << 17  # smaller wave: CPU cull is slow
    waves = make_waves(scene, n)

    for cs in [128, 64]:
        accel = build_clusters(scene.triangles, cluster_size=cs)
        c = accel.num_clusters
        bmin = np.asarray(accel.bmin)
        bmax = np.asarray(accel.bmax)

        for wname in ["primary", "bounce", "shadow"]:
            o, d, tm = (np.asarray(a) for a in waves[wname])
            # sort exactly like the worklist (dir-major key)
            from path_tracer_ai_tpu.accel.traverse import _sort_keys

            keys = np.asarray(_sort_keys(accel, waves[wname][0],
                                         waves[wname][1], waves[wname][2],
                                         mode="dir"))
            perm = np.argsort(keys)
            o, d, tm = o[perm], d[perm], tm[perm]

            for block in [8, 16]:
                nb = n // block
                ob = o.reshape(nb, block, 3)
                db = d.reshape(nb, block, 3)
                tb = tm.reshape(nb, block)
                live = tb >= 0
                olo = np.where(live[..., None], ob, np.inf).min(axis=1)
                ohi = np.where(live[..., None], ob, -np.inf).max(axis=1)
                dlo = np.where(live[..., None], db, np.inf).min(axis=1)
                dhi = np.where(live[..., None], db, -np.inf).max(axis=1)
                tub = tb.max(axis=1)

                # interval slab, chunked over rows
                runs_all = []
                cands_all = []
                for s0 in range(0, nb, 4096):
                    sl = slice(s0, min(s0 + 4096, nb))
                    lb = np.full((sl.stop - sl.start, c), -np.inf, np.float32)
                    ub = np.full((sl.stop - sl.start, c), np.inf, np.float32)
                    with np.errstate(divide="ignore", invalid="ignore"):
                        for a in range(3):
                            nlo = bmin[None, :, a] - ohi[sl, a][:, None]
                            nhi = bmax[None, :, a] - olo[sl, a][:, None]
                            da_lo = dlo[sl, a][:, None]
                            da_hi = dhi[sl, a][:, None]
                            spans = (da_lo <= 0) & (da_hi >= 0)
                            q = np.stack([nlo / da_lo, nlo / da_hi,
                                          nhi / da_lo, nhi / da_hi])
                            qmin = np.nanmin(q, axis=0)
                            qmax = np.nanmax(q, axis=0)
                            lb = np.maximum(lb, np.where(spans, -np.inf, qmin))
                            ub = np.minimum(ub, np.where(spans, np.inf, qmax))
                    cand = (lb <= ub) & (ub >= 0) & \
                        (lb <= tub[sl][:, None]) & (tub[sl] >= 0)[:, None]
                    nc = cand.sum(axis=1)
                    # runs per row: transitions 0->1
                    starts = cand & ~np.pad(cand, ((0, 0), (1, 0)))[:, :-1]
                    runs = starts.sum(axis=1)
                    m = nc > 0
                    cands_all.append(nc[m])
                    runs_all.append(runs[m])
                nc = np.concatenate(cands_all)
                rn = np.concatenate(runs_all)
                # sweep cost models (tests per live ray)
                pad4 = np.ceil(nc / 4) * 4  # id-extraction, group 4
                # run model: each run padded to a multiple of 4 clusters
                print(dict(
                    cs=cs, wave=wname, block=block,
                    cand_mean=round(float(nc.mean()), 1),
                    runs_mean=round(float(rn.mean()), 2),
                    runs_p99=int(np.percentile(rn, 99)),
                    cand_p99=int(np.percentile(nc, 99)),
                    ids_per_run=round(float(nc.mean() / rn.mean()), 2),
                ), flush=True)


if __name__ == "__main__" and "--perray" not in sys.argv:
    main()


def perray():
    """Per-ray exact candidate-count distribution (clusters AND supers)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from __graft_entry__ import _demo_scene
    from path_tracer_ai_tpu.accel.clusters import build_clusters
    from scripts.perf_probe_r2 import make_waves

    scene, _ = _demo_scene(subdivisions=6)
    n = 1 << 17
    waves = make_waves(scene, n)
    for cs, ss in [(128, 16), (64, 16)]:
        accel = build_clusters(scene.triangles, cluster_size=cs,
                               super_size=ss)
        bmin = np.asarray(accel.bmin); bmax = np.asarray(accel.bmax)
        sbmin = np.asarray(accel.sbmin); sbmax = np.asarray(accel.sbmax)
        for wname in ["primary", "bounce", "shadow"]:
            o, d, tm = (np.asarray(a) for a in waves[wname])
            live = tm >= 0
            res = {}
            for tag, (lo_, hi_) in [("clus", (bmin, bmax)),
                                    ("super", (sbmin, sbmax))]:
                cnts = []
                for s0 in range(0, n, 16384):
                    sl = slice(s0, s0 + 16384)
                    with np.errstate(divide="ignore", invalid="ignore"):
                        inv = 1.0 / d[sl]
                        t0 = (lo_[None] - o[sl, None]) * inv[:, None]
                        t1 = (hi_[None] - o[sl, None]) * inv[:, None]
                        near = np.where(inv[:, None] < 0, t1, t0)
                        far = np.where(inv[:, None] < 0, t0, t1)
                        lb = np.maximum(near.max(axis=2), 1e-3)
                        ub = np.minimum(far.min(axis=2), tm[sl, None])
                    cand = (lb <= ub) & live[sl, None]
                    cnts.append(cand.sum(axis=1))
                c = np.concatenate(cnts)[live]
                res[tag] = dict(
                    mean=round(float(c.mean()), 2),
                    p90=int(np.percentile(c, 90)),
                    p99=int(np.percentile(c, 99)),
                    p999=int(np.percentile(c, 99.9)),
                    max=int(c.max()),
                )
            print(dict(cs=cs, wave=wname, **{k + "_" + kk: vv
                                             for k, v in res.items()
                                             for kk, vv in v.items()}),
                  flush=True)


if __name__ == "__main__" and "--perray" in sys.argv:
    perray()
    sys.exit(0)
