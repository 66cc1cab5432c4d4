"""Mosaic op-support diagnostic for the int4 unpack alternatives: compile
tiny Pallas kernels each using ONE candidate op and print pass/fail with
the FULL compiler error, so the shift-free decode can be built from ops
the backend actually supports.

Run: python tools/qmm_diag.py  (TPU) — or as a stage in a session tool.
"""

import functools
import json
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "axon,tpu,cpu")
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
print = functools.partial(print, flush=True)


def probe(name, body_fn, out_dtype="bfloat16"):
    import jax
    import jax.numpy as jnp
    import numpy as np
    import jax.experimental.pallas as pl

    def body(u_ref, o_ref):
        o_ref[:, :] = body_fn(u_ref[:, :], jnp)

    try:
        out = pl.pallas_call(
            body,
            in_specs=[pl.BlockSpec((8, 128), lambda: (0, 0))],
            out_specs=pl.BlockSpec((8, 128), lambda: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((8, 128),
                                           getattr(jnp, out_dtype)),
        )(jnp.ones((8, 128), jnp.int8))
        np.asarray(out)
        print(f"# PROBE {name}: OK")
        return True
    except Exception as e:  # noqa: BLE001
        msg = repr(e)
        print(f"# PROBE {name}: FAIL\n{msg[:2000]}\n# ---")
        return False


def main():
    import jax
    import numpy as np
    np.asarray(jax.numpy.zeros((1,)))
    print(f"# device ready: {jax.devices()[0]}")

    results = {}
    results["i8_and"] = probe(
        "int8 AND", lambda u, jnp: (u & jnp.int8(15)).astype(jnp.bfloat16))
    results["i8_xor"] = probe(
        "int8 XOR", lambda u, jnp: (u ^ jnp.int8(8)).astype(jnp.bfloat16))
    results["i8_sub"] = probe(
        "int8 SUB", lambda u, jnp: (u - jnp.int8(8)).astype(jnp.bfloat16))
    results["i8_to_bf16"] = probe(
        "int8->bf16 cast", lambda u, jnp: u.astype(jnp.bfloat16))
    results["i8_cmp"] = probe(
        "int8 compare+select",
        lambda u, jnp: jnp.where(u >= jnp.int8(8), jnp.bfloat16(1),
                                 jnp.bfloat16(0)))
    results["bf16_floor"] = probe(
        "bf16 floor", lambda u, jnp: jnp.floor(
            u.astype(jnp.bfloat16) * jnp.bfloat16(0.0625)))
    results["f32_floor"] = probe(
        "f32 floor -> bf16", lambda u, jnp: jnp.floor(
            u.astype(jnp.float32) * (1 / 16)).astype(jnp.bfloat16))
    results["i16_shift"] = probe(
        "int16 shift", lambda u, jnp: (
            (u.astype(jnp.int16) >> 4)).astype(jnp.bfloat16))
    results["i8_mod"] = probe(
        "int8 mod 16", lambda u, jnp: (u % jnp.int8(16)
                                       ).astype(jnp.bfloat16))
    results["full_nib8"] = probe(
        "full nib8 decode", lambda u, jnp: (
            (u.astype(jnp.bfloat16)
             - (u & jnp.int8(15)).astype(jnp.bfloat16))
            * jnp.bfloat16(0.0625)))
    print(json.dumps({"metric": "qmm mosaic op probes", **results}))
    return results


if __name__ == "__main__":
    main()
