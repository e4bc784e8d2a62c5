"""Analytical roofline for the production train step (VERDICT r3 weak #2).

Enumerates every conv in models/unet.py (topology parity with
/root/reference/src/unet.py:77-119) and computes, per block, the
forward/backward FLOPs and the minimum HBM traffic, then the roofline
lower bound on step time at the chip's peak MXU rate and peak HBM
bandwidth. This is the "written analysis proving the conv backward is
roofline-bound" half of the VERDICT #2 deliverable; the other half is
the measured per-block table (scripts/profile_blocks.py, chip queue)
that this script's table is joined against.

Model of costs (documented estimates, not a simulator):
  fwd FLOPs(conv)   = 2 * B * Hout^2 * k^2 * Cin * Cout
  bwd FLOPs         = 2x fwd (input-grad conv + weight-grad conv)
  fwd bytes         = read(in act) + write(out act), bf16, weights
                      counted once (negligible vs activations here)
  bwd bytes         = 2.5x fwd  (read saved act + read grad-out +
                      write grad-in, plus weight-grad re-reads; BN adds
                      f32 stat traffic we fold into the factor)
No XLA fusion credit is taken for conv<->conv boundaries (convs cannot
fuse through each other); BN+ReLU are assumed fully fused into the
producing conv, which XLA does (so per-conv traffic is counted once).

Usage: python scripts/roofline.py [batch=128] [peak_tflops=197]
       [peak_gbs=819]

Defaults are the v5e the bench runs on: 197 bf16 TFLOP/s (394 is the
chip's int8 number) and 819 GB/s HBM.
"""

import sys

# (block, H_out, Cin, Cout, k) for every conv in the production forward,
# in call order (models/unet.py:134-162). ConvTranspose k3 s2 is counted
# at its INPUT resolution (each input pixel multiplies the full k^2
# stencil): FLOPs = 2*B*Hin^2*9*Cin*Cout.
HEADS = (1, 14, 3, 2, 1, 360, 60, 60)
CONVS = [
    ("inc1",   512, 1,   16,  3), ("inc1",   512, 16,  16,  3),
    ("inc2",   512, 16,  16,  3), ("inc2",   512, 16,  16,  3),
    ("down1",  256, 16,  32,  3), ("down1",  256, 32,  32,  3),
    ("down2",  128, 32,  64,  3), ("down2",  128, 64,  64,  3),
    ("inc3",   128, 64,  64,  3), ("inc3",   128, 64,  64,  3),
    ("down3",  64,  64,  128, 3), ("down3",  64,  128, 128, 3),
    ("down4",  32,  128, 256, 3), ("down4",  32,  256, 256, 3),
    ("down5",  16,  256, 512, 3), ("down5",  16,  512, 512, 3),
    ("up1",    16,  512, 256, 3),                      # convT @ in-res
    ("up1",    32,  512, 256, 3), ("up1",    32,  256, 256, 3),
    ("up2",    32,  256, 128, 3),                      # convT
    ("up2",    64,  256, 128, 3), ("up2",    64,  128, 128, 3),
    ("up3",    64,  128, 64,  3),                      # convT
    ("up3",    128, 128, 128, 3), ("up3",    128, 128, 128, 3),
    ("dconv1", 128, 128, 128, 3), ("dconv1", 128, 128, 128, 3),
    ("dconv2", 128, 128, 128, 3), ("dconv2", 128, 128, 128, 3),
] + [("heads", 128, 128, 128, 3) for _ in HEADS] \
  + [("heads", 128, 128, w, 1) for w in HEADS]

BYTES_ACT = 2          # bf16 activations
BWD_FLOP_FACTOR = 2.0  # input-grad + weight-grad convs
BWD_BYTE_FACTOR = 2.5  # see module docstring
MXU = 128              # systolic array tile edge


def _mxu_eff(k, cin, cout):
    """Fraction of MXU peak a conv-as-matmul can reach: the contraction
    dim K = k^2*Cin and the output dim N = Cout each waste the tile when
    below 128 lanes (spatial fills M, never the limiter here)."""
    kdim = k * k * cin
    return min(1.0, kdim / MXU) * min(1.0, cout / MXU)


def analyze(batch, peak_tflops, peak_gbs):
    rows = {}
    for block, h, cin, cout, k in CONVS:
        f_fwd = 2.0 * batch * h * h * k * k * cin * cout
        # Input read at the conv's input resolution (= output res for
        # SAME convs; convT input is the smaller grid, already h here).
        b_fwd = batch * h * h * (cin + cout) * BYTES_ACT \
            + k * k * cin * cout * 4
        r = rows.setdefault(block, [0.0, 0.0, 0.0])
        r[0] += f_fwd * (1.0 + BWD_FLOP_FACTOR)
        r[1] += b_fwd * (1.0 + BWD_BYTE_FACTOR)
        r[2] += f_fwd * (1.0 + BWD_FLOP_FACTOR) / _mxu_eff(k, cin, cout)

    print(f"batch {batch}, peak {peak_tflops} bf16 TFLOP/s, "
          f"{peak_gbs} GB/s HBM")
    print(f"{'block':8} {'GFLOP':>9} {'GB':>7} {'flops-ms':>9} "
          f"{'eff-ms':>7} {'bw-ms':>7} {'bound':>6}")
    tot_f = tot_b = tot_ms = tot_naive = 0.0
    for block in dict.fromkeys(b for b, *_ in CONVS):
        f, b, fe = rows[block]
        ms_f = f / (peak_tflops * 1e12) * 1e3
        ms_fe = fe / (peak_tflops * 1e12) * 1e3
        ms_b = b / (peak_gbs * 1e9) * 1e3
        bound = "MXU" if ms_fe > ms_b else "HBM"
        print(f"{block:8} {f/1e9:9.1f} {b/1e9:7.2f} {ms_f:9.2f} "
              f"{ms_fe:7.2f} {ms_b:7.2f} {bound:>6}")
        tot_f += f
        tot_b += b
        tot_ms += max(ms_fe, ms_b)
        tot_naive += max(ms_f, ms_b)
    print(f"{'TOTAL':8} {tot_f/1e9:9.1f} {tot_b/1e9:7.2f}")
    print(f"naive roofline: {tot_naive:.1f} ms/step = "
          f"{batch/(tot_naive/1e3):.0f} img/s")
    print(f"MXU-tile-adjusted roofline: {tot_ms:.1f} ms/step = "
          f"{batch/(tot_ms/1e3):.0f} img/s "
          f"(pure-MXU bound {tot_f/(peak_tflops*1e12)*1e3:.1f} ms "
          f"= {batch/(tot_f/(peak_tflops*1e12)):.0f} img/s)")
    return tot_ms


if __name__ == "__main__":
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    tf = float(sys.argv[2]) if len(sys.argv) > 2 else 197.0
    gb = float(sys.argv[3]) if len(sys.argv) > 3 else 819.0
    analyze(b, tf, gb)
