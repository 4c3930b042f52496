"""Parameter partitioning: the functional equivalent of backbone freezing.

The reference freezes the pretrained SFNO by setting requires_grad=False on
everything except the film generator (or {film_gen, decoder, last-k blocks}
under --retrain-film; MSFNO/Models/sfno/model.py:922-923, 1016-1026) and runs
frozen submodules under torch.no_grad() (sfnonet.py:817-844).

In JAX we split the param pytree into (trainable, frozen) and differentiate
the loss only w.r.t. the trainable subset — XLA then never builds backward
compute for the frozen parameters, which subsumes both requires_grad=False
and the no_grad() memory optimization.
"""

from __future__ import annotations

from typing import Callable

from flax import traverse_util


def film_trainable_predicate(
    retrain_film: bool = False, num_layers: int = 12, retrain_blocks: int = 1
) -> Callable[[tuple[str, ...]], bool]:
    """Which param paths train during film fine-tuning.

    Default: only the film generator (+ mae film head).  With retrain_film,
    additionally the decoder and the last `retrain_blocks` SFNO blocks
    (reference grad_layers, sfno/model.py:1016-1026).
    """
    unfrozen_blocks = {
        f"blocks_{i}" for i in range(num_layers - retrain_blocks, num_layers)
    }

    def predicate(path: tuple[str, ...]) -> bool:
        top = path[0]
        if top in ("film_gen", "film_head"):
            return True
        if retrain_film and (top == "decoder" or top in unfrozen_blocks):
            return True
        return False

    return predicate


def split_params(params: dict, predicate) -> tuple[dict, dict]:
    """Split a flax param dict into (trainable, frozen) by path predicate."""
    flat = traverse_util.flatten_dict(params)
    trainable = {k: v for k, v in flat.items() if predicate(k)}
    frozen = {k: v for k, v in flat.items() if not predicate(k)}
    return (
        traverse_util.unflatten_dict(trainable),
        traverse_util.unflatten_dict(frozen),
    )


def merge_params(trainable: dict, frozen: dict) -> dict:
    flat = dict(traverse_util.flatten_dict(frozen))
    flat.update(traverse_util.flatten_dict(trainable))
    return traverse_util.unflatten_dict(flat)


def count_params(params: dict) -> int:
    import jax

    return sum(p.size for p in jax.tree_util.tree_leaves(params))
