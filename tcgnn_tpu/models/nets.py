"""Model stacks mirroring the reference trainer's inline ``Net`` classes.

The reference builds, per ``--model``, a stack of identical conv layers with
ReLU + dropout after the first layer and a ``log_softmax`` head
(/root/reference/main_tcgnn.py:75-139).  Structure (for L = num_layers):

    conv_in(features -> hidden) -> relu -> dropout
    (L-2) x [conv(hidden -> hidden) -> relu]
    conv_out(hidden -> classes) -> log_softmax

Functional form: ``init_net`` builds the params pytree, ``apply_net`` runs
the forward pass (dropout active only when a PRNG key is given, matching
``F.dropout(training=...)``).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp

from tcgnn_tpu.graph import TiledGraph
from tcgnn_tpu.models import layers as L

MODEL_KINDS = ("gcn", "gin", "agnn")


def init_net(
    key: jax.Array,
    kind: str,
    in_dim: int,
    hidden: int,
    classes: int,
    num_layers: int,
    n_heads: int = 1,
    init: str = "reference",
) -> List[Dict[str, jnp.ndarray]]:
    if kind not in MODEL_KINDS:
        raise ValueError(f"model must be one of {MODEL_KINDS}, got {kind!r}")
    dims = [in_dim] + [hidden] * max(num_layers - 1, 0)
    dims = dims[:num_layers] + [classes]
    keys = jax.random.split(key, len(dims) - 1)
    params = []
    for k, d_in, d_out in zip(keys, dims[:-1], dims[1:]):
        if kind == "agnn":
            params.append(L.init_agnn(k, d_in, d_out, n_heads))
        else:
            params.append(L.init_gcn(k, d_in, d_out, init))
    return params


def apply_net(
    params: List[Dict[str, jnp.ndarray]],
    kind: str,
    x: jnp.ndarray,
    graph: TiledGraph,
    dropout_key: Optional[jax.Array] = None,
    dropout_rate: float = 0.5,
    num_valid_classes: Optional[int] = None,
    norm: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Forward pass.  ``num_valid_classes`` masks trailing logit columns to
    -inf before the log_softmax — used by the distributed trainer when the
    class dim is padded up for even feature-axis sharding.  ``norm`` enables
    symmetric GCN normalization (see ``layers.gcn_conv``)."""
    conv = {"gcn": L.gcn_conv, "gin": L.gin_conv, "agnn": L.agnn_conv}[kind]
    if kind == "gcn" and norm is not None:
        conv = functools.partial(L.gcn_conv, norm=norm)

    h = jax.nn.relu(conv(params[0], x, graph))
    if dropout_key is not None:
        keep = 1.0 - dropout_rate
        mask = jax.random.bernoulli(dropout_key, keep, h.shape)
        h = jnp.where(mask, h / keep, 0.0)
    for p in params[1:-1]:
        h = jax.nn.relu(conv(p, h, graph))
    h = conv(params[-1], h, graph)
    if num_valid_classes is not None and num_valid_classes < h.shape[1]:
        col = jnp.arange(h.shape[1])[None, :]
        h = jnp.where(col < num_valid_classes, h, -1e30)
    return jax.nn.log_softmax(h, axis=1)
