"""S7 external-framework weight-layout mapping (the "AACHEN" loader).

The reference imports pretrained weights exported by an external
framework whose tensor layouts differ from its own
(/root/reference/Modules/utils.py:392-559, load_AACHEN_PARAMS):

- conv kernels arrive as (n_out, n_in, fh, fw) and are transposed to
  the TF layout (fh, fw, n_in, n_out) — ``transpose([2, 3, 1, 0])``;
- each MDLSTM direction arrives as THREE separate matrices W (input),
  U (horizontal recurrent), V (vertical recurrent) which the internal
  cell consumes as ONE stacked kernel ``concat([W, U, V], axis=0)`` of
  shape (cin + 2·units, 5·units); external direction indices 1..4 map
  to down-fwd / up-fwd / down-bwd / up-bwd;
- the dense output head passes through unchanged.

This module is the same mapping over a PARQUET named-tensor table
(name, shape, values — the sandbox has no h5py; the h5 group/dataset
path becomes the row name, e.g. ``conv0/W_conv0``). The scan is the
S7 pattern: one small driver-side collect of the weight table, then a
broadcast to the decode stages — weights are KB-to-MB-sized, never
sharded."""

from __future__ import annotations

import numpy as np
from pyspark.sql import SparkSession

from htrtf_spark.operators.convnet import PARAMS_DDL, load_params
from htrtf_spark.operators.mdlstm import DIRECTIONS

# external direction index (1-based, utils.py:441-458) → internal name
_DIR_OF = {1: "df", 2: "uf", 3: "db", 4: "ub"}


def map_aachen_params(ext: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """Pure layout mapping: external named tensors → the internal
    parameter dict the conv/MDLSTM/dense operators consume. External
    indices are 0-based (conv0..conv4, mdlstm0..mdlstm4); internal
    layer names are 1-based (conv1/kernel..., mdlstm1/df_kernel...)."""
    out: dict[str, np.ndarray] = {}
    conv_ids = sorted(
        int(k[4:].split("/")[0]) for k in ext if k.startswith("conv")
        and "/W_" in k
    )
    for i in conv_ids:
        w = ext[f"conv{i}/W_conv{i}"]
        if w.ndim != 4:
            raise ValueError(f"conv{i} kernel must be 4-D, got {w.shape}")
        # (n_out, n_in, fh, fw) → (fh, fw, n_in, n_out)  [utils.py:420]
        out[f"conv{i + 1}/kernel"] = np.ascontiguousarray(
            w.transpose([2, 3, 1, 0])
        )
        out[f"conv{i + 1}/bias"] = ext[f"conv{i}/b_conv{i}"]
    md_ids = sorted(
        int(k[6:].split("/")[0]) for k in ext if k.startswith("mdlstm")
        and "/W1_" in k
    )
    for i in md_ids:
        for d in (1, 2, 3, 4):
            w = ext[f"mdlstm{i}/W{d}_mdlstm{i}"]
            u = ext[f"mdlstm{i}/U{d}_mdlstm{i}"]
            v = ext[f"mdlstm{i}/V{d}_mdlstm{i}"]
            if not (w.shape[1] == u.shape[1] == v.shape[1]):
                raise ValueError(
                    f"mdlstm{i} dir {d}: gate widths differ "
                    f"({w.shape}, {u.shape}, {v.shape})"
                )
            if u.shape[0] != v.shape[0]:
                raise ValueError(
                    f"mdlstm{i} dir {d}: recurrent unit counts differ"
                )
            name = _DIR_OF[d]
            # stacked cell kernel: [x; h; v] rows  [utils.py:443-445]
            out[f"mdlstm{i + 1}/{name}_kernel"] = np.concatenate(
                (w, u, v), axis=0
            )
            out[f"mdlstm{i + 1}/{name}_bias"] = ext[
                f"mdlstm{i}/b{d}_mdlstm{i}"
            ]
    if "output/W_in_mdlstm4_output" in ext:
        out["dense/kernel"] = ext["output/W_in_mdlstm4_output"]
        out["dense/bias"] = ext["output/b_output"]
    return out


def load_aachen_params(spark: SparkSession, path: str) -> dict[str, np.ndarray]:
    """S7 scan of an external-layout weight table + layout mapping: the
    parquet analog of load_AACHEN_PARAMS (h5 group/dataset path == row
    name). One driver-side collect (weights are small by design), then
    callers broadcast the returned dict."""
    return map_aachen_params(load_params(spark, path))


def synth_aachen_params(
    seed: int = 0,
    conv_layers: int = 5,
    in_channels: int = 1,
    conv_out: int = 4,
    mdlstm_layers: int = 5,
    cin: int = 3,
    units: int = 2,
    num_classes: int = 7,
) -> dict[str, np.ndarray]:
    """Deterministic external-layout weight set (the AACHEN h5 stand-in)
    with deliberately ASYMMETRIC shapes so any axis confusion in the
    mapping breaks shape checks instead of passing silently."""
    rs = np.random.RandomState(seed)
    ext: dict[str, np.ndarray] = {}
    n_in = in_channels
    for i in range(conv_layers):
        n_out = conv_out + i  # distinct per layer
        ext[f"conv{i}/W_conv{i}"] = rs.normal(
            0, 0.1, size=(n_out, n_in, 3, 5)
        ).astype(np.float32)
        ext[f"conv{i}/b_conv{i}"] = rs.normal(0, 0.1, size=(n_out,)).astype(
            np.float32
        )
        n_in = n_out
    for i in range(mdlstm_layers):
        for d in (1, 2, 3, 4):
            ext[f"mdlstm{i}/W{d}_mdlstm{i}"] = rs.normal(
                0, 0.1, size=(cin, 5 * units)
            ).astype(np.float32)
            ext[f"mdlstm{i}/U{d}_mdlstm{i}"] = rs.normal(
                0, 0.1, size=(units, 5 * units)
            ).astype(np.float32)
            ext[f"mdlstm{i}/V{d}_mdlstm{i}"] = rs.normal(
                0, 0.1, size=(units, 5 * units)
            ).astype(np.float32)
            ext[f"mdlstm{i}/b{d}_mdlstm{i}"] = rs.normal(
                0, 0.1, size=(5 * units,)
            ).astype(np.float32)
    ext["output/W_in_mdlstm4_output"] = rs.normal(
        0, 0.1, size=(units, num_classes)
    ).astype(np.float32)
    ext["output/b_output"] = rs.normal(0, 0.1, size=(num_classes,)).astype(
        np.float32
    )
    return ext
