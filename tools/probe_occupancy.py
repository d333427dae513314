"""Measure probe occupancy of the grid join on realistic fine-delta
data (CPU; informs Options.join_probe_budget / cell_candidates
defaults). Run from the repo root."""
import _path  # noqa: F401  (repo root on sys.path)
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_platforms", "cpu")
from bench import fine_delta_pair
from super4pcs_tpu import Options
from super4pcs_tpu.options import DISTANCE_FACTOR
from super4pcs_tpu.ops import sampling, select, geometry, congruent
from super4pcs_tpu.ops.pairs import PairFilterConfig, extract_pairs_rowcap_layout
from super4pcs_tpu.cloud import PointCloud

pos, q = fine_delta_pair()
opts = Options(delta=0.01, sample_size=8192, random_seed=5)
rng = np.random.default_rng(5)
ps = sampling.sample_for_matching(PointCloud(pos=pos), opts.delta, opts.sample_size, truncate=False, rng=rng)
qs = sampling.sample_for_matching(PointCloud(pos=q), opts.delta, opts.sample_size, truncate=True, rng=rng)
p_pos = jnp.asarray(ps.pos - ps.pos.mean(0))
q_pos = jnp.asarray(qs.pos - qs.pos.mean(0))
diam = geometry.estimate_diameter(np.asarray(q_pos), 1000, rng)
key = jax.random.key(5)
ids, inv1, inv2, bvalid = select.select_base(key, p_pos, diam, opts.n_triangle_trials)
base_pos = p_pos[ids]
cfg = PairFilterConfig()
eps = DISTANCE_FACTOR * opts.delta
nq = q_pos.shape[0]
row_cap = 160
zero = jnp.zeros((nq,3)); neg = jnp.full((nq,3), -1.0)
bz = jnp.zeros((4,3)); bn = jnp.full((4,3), -1.0)
pairs1, v1, c1, d1 = extract_pairs_rowcap_layout(
    q_pos, zero, neg, base_pos, bz, bn, 0, 1, eps, cfg, row_cap=row_cap)
pairs2, v2, c2, d2 = extract_pairs_rowcap_layout(
    q_pos, zero, neg, base_pos, bz, bn, 2, 3, eps, cfg, row_cap=row_cap)
print("valid1:", int(v1.sum()), "of", v1.shape[0], " count1:", int(c1), "dropped:", int(d1))
print("valid2:", int(v2.sum()), " count2:", int(c2))

r = DISTANCE_FACTOR * opts.delta
cell = 2.0 * r
pos_np = np.asarray(q_pos); p1 = np.asarray(pairs1); val1 = np.asarray(v1)
e1 = pos_np[p1[:,0]] + float(inv1) * (pos_np[p1[:,1]] - pos_np[p1[:,0]])
cells1 = np.floor(e1 / cell).astype(np.int64)
keys1 = cells1[:,0]*73856093 ^ cells1[:,1]*19349669 ^ cells1[:,2]*83492791
keys1 = keys1[val1]
uniq, cnt = np.unique(keys1, return_counts=True)
print(f"table: {len(keys1)} entries in {len(uniq)} cells; occupancy mean {cnt.mean():.1f} p50 {np.percentile(cnt,50):.0f} p90 {np.percentile(cnt,90):.0f} p99 {np.percentile(cnt,99):.0f} max {cnt.max()}")

p2 = np.asarray(pairs2); val2 = np.asarray(v2)
e2 = pos_np[p2[:,0]] + float(inv2) * (pos_np[p2[:,1]] - pos_np[p2[:,0]])
e2 = e2[val2][:8192]
bc = np.floor((e2 - r)/cell).astype(np.int64)
offs = np.array([(i,j,k) for i in (0,1) for j in (0,1) for k in (0,1)])
probes = (bc[:,None,:] + offs[None]).reshape(-1,3)
hq = probes[:,0]*73856093 ^ probes[:,1]*19349669 ^ probes[:,2]*83492791
hit = np.isin(hq, uniq)
print(f"probes: {len(hq)}; non-empty: {hit.sum()} ({100*hit.mean():.1f}%)")
# cells with > L entries
for L in (8, 16, 32):
    over = cnt[cnt > L]
    print(f"L={L}: cells over cap {len(over)} ({100*len(over)/len(uniq):.2f}%), dropped entries {int((over-L).sum())} of {len(keys1)}")
