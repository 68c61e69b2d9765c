"""Parameter grouping by top-level pytree key.

Capability parity with the reference ``classify_group``
(``runners/diffusion.py:65-87``): each config group lists ``top_level_name``
prefixes; a parameter whose top-level name matches is assigned to that group,
everything else falls to ``"default"``; groups that end up empty are dropped.

Verified reference behavior (SURVEY.md §2.12): with audio.yml,
``transformer`` → AdamW group (27.3M params) and everything else → AdaBelief
``default`` group; both grad_norm groups list empty ``top_level_name`` so all
params clip together in ``default`` with clip=1.
"""

from __future__ import annotations

import jax


def classify_top_level(groups_cfg) -> dict:
    """{top_level_name: group_name} from a config namespace of groups."""
    mapping = {}
    for group_name, sub in vars(groups_cfg).items():
        for top in getattr(sub, "top_level_name", []) or []:
            mapping[top] = group_name
    return mapping


def group_labels(groups_cfg, params):
    """Returns (label_pytree, {group_name: group_cfg_namespace}) for
    optax.multi_transform. Only groups with ≥1 param survive."""
    mapping = classify_top_level(groups_cfg)
    used = set()

    labels = {}
    for top_key, subtree in params.items():
        group = mapping.get(top_key, "default")
        used.add(group)
        labels[top_key] = jax.tree_util.tree_map(lambda _: group, subtree)

    groups = {
        name: sub for name, sub in vars(groups_cfg).items() if name in used
    }
    return labels, groups
