"""Shared test helpers.

``jit_init`` / ``jit_apply``: jitted flax Module.init/apply for tests. Eager init/apply
pays per-op dispatch on the 1-core CPU host (measured 9-21 s for the mid-size test
models); under jit the whole program compiles once — and lands in the suite's persistent
compilation cache (conftest.py), so repeat suite runs skip the compile entirely
(measured: DenoiserTransformer.init 9.4 s eager -> 1.3 s jitted+cached).

Keyword arguments with non-array values (train/deterministic bools, method callables,
mutable tuples) are marked static; array-valued kwargs stay dynamic jit inputs. Pass
``mutable`` as a tuple, not a list (lists of strings are neither hashable nor jax types).
"""

import jax


def _static_names(kwargs) -> tuple:
    return tuple(
        k for k, v in kwargs.items()
        if v is None or isinstance(v, (bool, str, int, float, tuple)) or callable(v)
    )


def jit_init(module, rngs, *args, **kwargs):
    fn = jax.jit(module.init, static_argnames=_static_names(kwargs))
    return fn(rngs, *args, **kwargs)


def jit_apply(module, variables, *args, **kwargs):
    fn = jax.jit(module.apply, static_argnames=_static_names(kwargs))
    return fn(variables, *args, **kwargs)
