"""Joint byte+FLOP roofline over the last train trace.

roofline_train.py bounds every op by HBM byte movement alone. That
misclassifies conv-bearing fusions: on this stack XLA fuses dgrad
convolutions INTO the BN/SiLU-backward kOutput fusions (e.g. the
`multiply_reduce_fusion` family contains `conv_general_dilated` with
lhs_dilate — see /tmp/train_hlo.txt %fused_computation.43), so their true
floor is max(bytes/BW, MACs/MXU-peak). This tool parses the optimized HLO
dump, attributes conv FLOPs to each traced op (recursing through nested
sub-fusions), and reports measured-vs-bound per family plus the aggregate
"addressable" gap for the whole step.

Conv FLOPs = 2 * out_elems * (rhs_elems / rhs_o_dim) from dim_labels; for
lhs_dilated convs (dgrad of strided convs) a second, optimistic bound
divides by prod(lhs_dilate) — the zero taps a smarter kernel could skip.

Usage: python experiments/roofline_flops.py [hlo_path] [min_ms] [steps] [hbm_gbs]

hbm_gbs defaults to the v5e SPEC 819 GB/s (a strict floor). Pass the
measured-achievable elementwise number (~430, PERF.md) to see which gaps
survive realistic bandwidth.
"""

import glob
import re
import sys
from collections import defaultdict

HBM_GBS = 819.0   # v5e spec HBM bandwidth (strict floor; PERF.md)
MXU_TFS = 163.0   # measured bf16 peak (PERF.md)

hlo_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/train_hlo.txt"
min_ms = float(sys.argv[2]) if len(sys.argv) > 2 else 0.25
steps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
if len(sys.argv) > 4:
    HBM_GBS = float(sys.argv[4])

DTYPE_BYTES = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "s8": 1, "u8": 1,
               "pred": 1, "f16": 2, "s16": 2, "u16": 2, "s64": 8, "u64": 8, "f64": 8}
shape_re = re.compile(r"(f32|bf16|s32|u32|s8|u8|pred|f16|s16|u16|s64|u64|f64)\[([\d,]*)\]")


def shape_bytes(text):
    total = 0
    for dt, dims in shape_re.findall(text):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * DTYPE_BYTES[dt]
    return total


def dims_of(text):
    m = shape_re.search(text)
    if not m:
        return None
    return [int(d) for d in m.group(2).split(",") if d]


conv_line_re = re.compile(
    r"=\s*\S+\s+convolution\(([^)]*)\).*?window=\{([^}]*)\}.*?dim_labels=(\S+)")


def conv_flops(line, symtab=None):
    """(full_flops, skip_dilation_flops) for one HLO convolution line.

    This dump prints operands UNTYPED inside computation bodies
    (`convolution(%p0, %p1)`), so the rhs shape is resolved by name via
    `symtab` (instruction/param name -> dims list). Falls back to inline
    typed shapes when present (top-level instructions).
    """
    m = conv_line_re.search(line)
    if not m:
        return 0.0, 0.0
    operands, window, dim_labels = m.groups()
    # Output shape: first typed shape after '='.
    out_dims = dims_of(line.split("=", 1)[1])
    if out_dims is None:
        return 0.0, 0.0
    rhs = None
    pre_window = line[: line.find("window=")]
    typed = shape_re.findall(pre_window)
    if len(typed) >= 3:  # typed operands inline: out, lhs, rhs
        rhs = [int(d) for d in typed[-1][1].split(",") if d]
    elif symtab is not None:
        names = [o.strip().lstrip("%") for o in operands.split(",")]
        if len(names) >= 2:
            rhs = symtab.get(names[-1])
    if rhs is None:
        return 0.0, 0.0
    # XLA rewrites wgrad/dgrad as convs with activation-shaped "kernels"
    # and huge windows (e.g. window=160x160 pad=159_159, rhs_reversal) —
    # the generic taps formula overcounts those by ~1000x (naive sliding
    # window, which the TPU backend does not execute). Their true MXU
    # floor is <= the fwd conv's FLOPs, which at these channel widths is
    # below the byte bound — so bound them by bytes only.
    wm = re.search(r"size=(\d+)x(\d+)", window)
    if wm and (int(wm.group(1)) > 31 or int(wm.group(2)) > 31):
        return 0.0, 0.0
    out_elems = 1
    for d in out_dims:
        out_elems *= d
    lhs_spec, rest = dim_labels.split("_", 1)
    rhs_spec, out_spec = rest.split("->")
    rhs_spec = rhs_spec.split(",")[0].rstrip(";")
    o_pos = rhs_spec.index("o")
    contraction = 1
    for i, d in enumerate(rhs):
        if i != o_pos:
            contraction *= d
    full = 2.0 * out_elems * contraction
    skip = full
    dm = re.search(r"lhs_dilate=(\d+)x(\d+)", window)
    if dm:
        skip = full / (int(dm.group(1)) * int(dm.group(2)))
    return full, skip


# ---- parse the optimized HLO into computations + per-comp symbol tables ----
comps = {}    # name -> list of body lines
symtabs = {}  # name -> {instr/param name: dims list}
param_re = re.compile(r"([\w.\-]+):\s*(f32|bf16|s32|u32|s8|u8|pred|f16|s16|u16|s64|u64|f64)\[([\d,]*)\]")
cur = None
with open(hlo_path) as f:
    for line in f:
        s = line.strip()
        m = re.match(r"%?([\w.\-]+)\s*\((.*)\)\s*->\s*.*\{", s)
        if m and not s.startswith("ROOT"):
            cur = m.group(1)
            comps[cur] = []
            symtabs[cur] = {
                pname: [int(d) for d in dims.split(",") if d]
                for pname, _dt, dims in param_re.findall(m.group(2))
            }
            continue
        if s == "}":
            cur = None
            continue
        if cur is not None:
            comps[cur].append(s)
            dm = re.match(r"(?:ROOT\s+)?%?([\w.\-]+)\s*=", s)
            if dm:
                d = dims_of(s.split("=", 1)[1])
                if d is not None:
                    symtabs[cur][dm.group(1)] = d


def comp_flops(name, seen=None):
    if seen is None:
        seen = set()
    if name in seen or name not in comps:
        return 0.0, 0.0
    seen.add(name)
    full = skip = 0.0
    for line in comps[name]:
        if " convolution(" in line:
            f, k = conv_flops(line, symtabs.get(name))
            full += f
            skip += k
        cm = re.search(r"calls=%([\w.\-]+)", line)
        if cm:
            f, k = comp_flops(cm.group(1), seen)
            full += f
            skip += k
    return full, skip


# ---- join with the trace ----
from tensorflow.tsl.profiler.protobuf import xplane_pb2  # noqa: E402

paths = sorted(glob.glob("/tmp/leanyolo_tpu_prof/**/*.xplane.pb", recursive=True))
xs = xplane_pb2.XSpace()
with open(paths[-1], "rb") as f:
    xs.ParseFromString(f.read())

fam_t = defaultdict(float)
fam_bound = defaultdict(float)
fam_bytes = defaultdict(float)
fam_flop_bound = defaultdict(float)
fam_gap = defaultdict(float)
fam_n = defaultdict(int)
tot_all = 0.0
rows = []
for plane in xs.planes:
    if "TPU" not in plane.name:
        continue
    meta = {m.id: m.name for m in plane.event_metadata.values()}
    tot = defaultdict(float)
    for line in plane.lines:
        if line.name != "XLA Ops":
            continue
        for ev in line.events:
            tot[meta.get(ev.metadata_id, "?")] += ev.duration_ps / 1e9
    tot_all = sum(tot.values()) / steps
    for name, t_ms in tot.items():
        t = t_ms / steps
        eq = name.find("=")
        short = name.split("=")[0].strip().lstrip("%")
        fam = re.sub(r"[.\-]\d+$", "", short).replace("-start", "").replace("-done", "")
        b = shape_bytes(name)
        if re.match(r"(dynamic-)?slice", fam):
            # A slice reads only its window: the event text's full input
            # shape over-counts (the earlier all-shapes bound put the slice
            # family at 97.7 ms vs 2.5 measured). Floor = read + write the
            # output extent.
            m_out = shape_re.search(name.split("=", 1)[1]) if "=" in name else None
            if m_out is not None:
                dt, dims = m_out.groups()
                n = 1
                for d in dims.split(","):
                    if d:
                        n *= int(d)
                b = 2 * n * DTYPE_BYTES[dt]
        t_bytes = b / (HBM_GBS * 1e6)
        full = skip = 0.0
        if " convolution(" in name:  # bare conv op at top level
            full, skip = conv_flops(name)
        cm = re.search(r"calls=%([\w.\-]+)", name)
        if cm:
            f2, k2 = comp_flops(cm.group(1))
            full += f2
            skip += k2
        t_flop = skip / (MXU_TFS * 1e9)          # optimistic: dilation zeros skipped
        t_flop_full = full / (MXU_TFS * 1e9)     # pessimistic: zeros computed
        bound = max(t_bytes, t_flop)
        fam_t[fam] += t
        fam_bound[fam] += bound
        fam_bytes[fam] += t_bytes
        fam_flop_bound[fam] += t_flop
        fam_gap[fam] += max(0.0, t - bound)
        fam_n[fam] += 1
        if t >= min_ms:
            rows.append((t, bound, t_bytes, t_flop, t_flop_full, short))

rows.sort(reverse=True)
print(f"step total {tot_all:.2f} ms; bounds @ {HBM_GBS:.0f} GB/s HBM, {MXU_TFS:.0f} TF/s MXU")
print(f"{'ms':>8} {'bound':>7} {'x':>5} {'t_byte':>7} {'t_flop':>7} {'t_fl_full':>9}  op")
for t, bound, tb, tf, tff, short in rows:
    print(f"{t:8.3f} {bound:7.3f} {t / max(bound, 1e-9):5.1f} {tb:7.3f} {tf:7.3f} {tff:9.3f}  {short}")

print(f"\nper-family (all ops, not just >= {min_ms} ms; gap = sum over ops of max(0, t - bound))")
print(f"{'ms':>8} {'bound':>8} {'x':>5} {'gap':>7} {'n':>5}  family")
gt = gg = 0.0
for fam in sorted(fam_t, key=lambda k: -fam_gap[k]):
    t, bo, gp = fam_t[fam], fam_bound[fam], fam_gap[fam]
    gt += t
    gg += gp
    if t < 0.05:
        continue
    print(f"{t:8.3f} {bo:8.3f} {t / max(bo, 1e-9):5.1f} {gp:7.3f} {fam_n[fam]:5d}  {fam}")
print(f"\nTOTAL measured {gt:.1f} ms; per-op addressable gap sum(max(0, t - floor)) = "
      f"{gg:.1f} ms ({100 * gg / gt:.1f}% of step). Floors are per-op "
      f"max(HBM-byte, MXU-flop) lower bounds; a fusion at 1.0x is closed.")
