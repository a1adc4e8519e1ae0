"""Node decoders for node classification.

The reference's NoOpNodeDecoder (noop_node_decoder.cpp:6) returns the encoder
output unchanged — classification logits come from the final encoder layer.
"""

from __future__ import annotations

import jax


def noop_node_decoder(encoded_nodes: jax.Array) -> jax.Array:
    return encoded_nodes
