"""Model registry — the TPU analogue of ``utils/utils_train.py:create_model``.

Every model is a flax module with the uniform dense interface::

    out = model.apply(params, scene, mask)    # out: [B, N, 3 * num_targets]

where ``scene`` is a :class:`~..core.scene.Scene` and ``mask`` the
``[B, N, N]`` neighbour mask.  ``create_model(model_type, **overrides)``
instantiates from the per-model defaults of the reference ``config.yaml``.
"""

from __future__ import annotations

from typing import Any, Dict

from .egnn_mc import EGNNMC
from .graph_transformer import GraphTransformer
from .painn import PaiNN

MODEL_REGISTRY: Dict[str, Any] = {
    "egnn_mc": EGNNMC,
    "painn": PaiNN,
    "graph_transformer": GraphTransformer,
}

# Defaults mirroring the reference config.yaml models section.
MODEL_DEFAULTS: Dict[str, Dict[str, Any]] = {
    "egnn_mc": dict(
        num_layers=6,
        hidden_node_dim=128,
        hidden_edge_dim=128,
        hidden_coord_dim=128,
        node_input_dim=2,
        edge_attr_dim=4,
        activation="silu",
        coords_weight=1.0,
        recurrent=True,
        norm_diff=True,
        tanh=True,
    ),
    "painn": dict(
        hidden_features=192,
        num_layers=6,
        num_rbf=64,
        cutoff=10.0,
        use_velocity_input=True,
        include_velocity_norm=True,
    ),
    "graph_transformer": dict(hidden_features=96, num_layers=4, num_heads=4),
}


def register_model(name: str, cls, defaults: Dict[str, Any] | None = None) -> None:
    MODEL_REGISTRY[name] = cls
    MODEL_DEFAULTS.setdefault(name, defaults or {})


def create_model(model_type: str, **overrides):
    """Instantiate a model by registry name with config.yaml-style defaults.

    ``None`` overrides mean "unset, use the default" (configs emit None for
    absent fields).  Knobs where "disabled" is meaningful use a disabling
    *value* instead, mirroring the reference's config surface — e.g.
    ``ponita: layer_scale=0.0`` disables layer scale
    (``ponita_nbody.py:54-55``).
    """
    if model_type not in MODEL_REGISTRY:
        raise ValueError(
            f"Unknown model_type '{model_type}'. Known: {sorted(MODEL_REGISTRY)}"
        )
    kwargs = dict(MODEL_DEFAULTS.get(model_type, {}))
    kwargs.update({k: v for k, v in overrides.items() if v is not None})
    return MODEL_REGISTRY[model_type](**kwargs)


def _register_extended_models() -> None:
    """Import model families implemented in later milestones, if present."""
    from .segnn import SEGNN, SEConv  # noqa: F401

    register_model(
        "segnn",
        SEGNN,
        dict(hidden_features=96, lmax_attr=1, lmax_h=1, num_layers=20),
    )
    register_model(
        "seconv",
        SEConv,
        dict(hidden_features=96, lmax_attr=1, lmax_h=1, num_layers=8),
    )
    from .ponita import PONITA  # noqa: F401

    register_model("ponita", PONITA, dict(hidden_features=128, num_layers=8))
    from .cgenn import CGENN  # noqa: F401

    register_model("cgenn", CGENN, dict(hidden_features=96, num_layers=4))
    from .gmn import GMN  # noqa: F401

    register_model(
        "gmn",
        GMN,
        dict(hidden_features=64, num_layers=4, n_isolated=5, n_stick=0, n_hinge=0),
    )
    from .equiformer_v2 import EquiformerV2  # noqa: F401

    register_model(
        "equiformer_v2",
        EquiformerV2,
        dict(
            num_layers=4,
            sphere_channels=64,
            attn_hidden_channels=64,
            num_heads=4,
            attn_alpha_channels=8,
            attn_value_channels=4,
            ffn_hidden_channels=64,
            edge_channels=64,
            num_distance_basis=64,
            max_neighbors=5,
            max_radius=4096.0,
            use_atom_edge_embedding=True,
            share_atom_edge_embedding=False,
            weight_init="normal",
        ),
    )


_register_extended_models()
