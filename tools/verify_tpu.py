import os, sys, time
import numpy as np, jax
from anemoi_tpu.fields.params import get_instance
from anemoi_tpu.ff import golden, pallas_backend as pb
from anemoi_tpu.modes import batched as bm

interp = os.environ.get("INTERP", "1") == "1"
inst = get_instance("vesta", "anemoi_2_1")
B = 256
rng = np.random.default_rng(0)
states = [[int(rng.integers(0, 2**62)) for _ in range(inst.width)] for _ in range(B)]
arr = bm.encode_states(inst, states)           # (WIDTH, L, B)
flat = arr.reshape(-1, B)                       # (WIDTH*L, B)

run = pb.permutation_pallas(inst, block_b=128, interpret=interp)
t0 = time.time()
out = np.asarray(run(flat))
print("compile+run:", f"{time.time()-t0:.1f}s")
out = out.reshape(inst.width, -1, B)
got = bm.decode_states(inst, out)
exp = [golden.permutation(inst, s) for s in states]
print("pallas perm ok:", got == exp)

runj = pb.jive_pallas(inst, 2, block_b=128, interpret=interp)
outj = np.asarray(runj(flat)).reshape(1, -1, B)
gotj = bm.decode_states(inst, outj)
expj = [golden.jive_compress(inst, s) for s in states]
print("pallas jive ok:", gotj == expj)
