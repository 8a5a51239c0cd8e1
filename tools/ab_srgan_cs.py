"""One-process interleaved A/B: SRGAN generator trunk CS-vs-XLA.

VERDICT r4 #3: the quantified G-trunk ablation (~16% of the 19.09 ms
step in 16 C=64 BN resblocks) was left unharvested because the
generator's ReflectionPad2d boundaries (reference srgan.py:20-27) did
not fit the zero-pad CS kernels. Round 5 added REFLECT boundary mode to
the BN resblock kernels (srtpu/ops/cs_conv.py: the mirrored neighbor is
the opposite-direction roll the 3x3 taps already compute); this measures
the full adversarial D+G step (reference srgan.py:136-190) with the
trunk on each path, interleaved in ONE process (CLAUDE.md rule 6 —
relay drift between separate runs swamps few-percent deltas).

Run ALONE on the TPU host (rules 1/5):
  nohup python tools/ab_srgan_cs.py > /tmp/ab_srgan.log 2>&1 &
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

BATCH, PATCH, SCALE = 16, 128, 4
SMALL, BIG, REPEATS = 5, 30, 4


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from srtpu.models.srgan import SRGANDiscriminator, SRGANGenerator
    from srtpu.train.gan import create_gan_state, make_gan_train_step
    from srtpu.utils import enable_compilation_cache

    enable_compilation_cache()
    print('backend:', jax.default_backend(), flush=True)

    rng = np.random.default_rng(0)
    lr_img = jnp.asarray(rng.random(
        (BATCH, PATCH // SCALE, PATCH // SCALE, 3), np.float32))
    hr_img = jnp.asarray(rng.random((BATCH, PATCH, PATCH, 3), np.float32))
    disc = SRGANDiscriminator(dtype=jnp.bfloat16)
    step = make_gan_train_step()

    arms = {}
    for name, up in (('cs', 'cs'), ('xla', False)):
        gen = SRGANGenerator(scale_factor=SCALE, dtype=jnp.bfloat16,
                             use_pallas=up)
        arms[name] = [create_gan_state(gen, disc, jax.random.PRNGKey(0),
                                       lr_img)]

    def window(arm, n):
        t0 = time.perf_counter()
        logs = None
        for _ in range(n):
            arms[arm][0], logs = step(arms[arm][0], lr_img, hr_img)
        float(logs['g_loss'])  # value fetch = the only true sync
        return time.perf_counter() - t0

    for name in arms:  # compile + steady state
        t0 = time.time()
        window(name, 2)
        print(f'{name}: compile+warm {time.time() - t0:.1f}s', flush=True)

    smalls = {k: [] for k in arms}
    bigs = {k: [] for k in arms}
    for r in range(REPEATS):
        for k in arms:
            smalls[k].append(window(k, SMALL))
        for k in arms:
            bigs[k].append(window(k, BIG))
        print(f'round {r}: ' + '  '.join(
            f'{k}={(bigs[k][-1] - smalls[k][-1]) / (BIG - SMALL) * 1e3:.2f}ms'
            for k in arms), flush=True)

    for k in arms:
        ms = (min(bigs[k]) - min(smalls[k])) / (BIG - SMALL) * 1e3
        print(f'{k}: {ms:.2f} ms/step  {BATCH / ms * 1e3:.0f} patches/s',
              flush=True)


if __name__ == '__main__':
    main()
