"""Headline benchmark: batch-64 inference pipeline images/sec/chip.

Measures the reference's headline workload (img2smiles2.py batch loop:
preprocess -> U-Net forward -> heatmap NMS/peak decode) as one fused
XLA program on a single TPU chip — BASELINE.json's
"images/sec/chip at batch 64".

The reference publishes no throughput numbers (BASELINE.md), so
``vs_baseline`` is reported against an analytic estimate of the
reference's GPU inference rate: the production U-Net forward is
~104 GFLOPs/image at 512x512 (summed conv MACs x2); a V100-class GPU
sustaining ~35% of 15.7 TFLOP/s fp32 on this conv mix gives
~5.5 TFLOP/s -> ~53 images/sec. We round the reference baseline to
REF_BASELINE_IPS = 55.0. The north-star target is >= 5x that.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}
"""

import json
import time

REF_BASELINE_IPS = 55.0
BATCH = 64
WARMUP = 3
ITERS = 20


def main() -> None:
    import jax
    import jax.numpy as jnp

    from abcnet_tpu.data import pipeline
    from abcnet_tpu.infer.decode import extract_peaks
    from abcnet_tpu.models.unet import UNet, init_unet

    model = UNet(dtype=jnp.bfloat16)
    variables = init_unet(jax.random.PRNGKey(0), model)

    @jax.jit
    def infer_pipeline(variables, image_bits):
        images = pipeline.device_unpack_bits(image_bits,
                                             jax.random.PRNGKey(0),
                                             train=False)
        preds = model.apply(variables, images, train=False)
        return extract_peaks(preds)

    host = pipeline.synthetic_batch(BATCH, seed=0)
    image_bits = host["image_bits"]

    for _ in range(WARMUP):
        peaks = infer_pipeline(variables, image_bits)
    jax.block_until_ready(peaks)

    t0 = time.perf_counter()
    for _ in range(ITERS):
        peaks = infer_pipeline(variables, image_bits)
    jax.block_until_ready(peaks)
    dt = time.perf_counter() - t0

    ips = BATCH * ITERS / dt
    print(json.dumps({
        "metric": "img2smiles_batch64_inference_throughput",
        "value": round(ips, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(ips / REF_BASELINE_IPS, 3),
    }))


if __name__ == "__main__":
    main()
