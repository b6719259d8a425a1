# pixelrec_multimodal_tpu/models/multimodal.py
"""The multimodal recommender scoring network (Flax).

Parity target: /root/reference/src/models/multimodal.py:31-675. Same
capabilities — ID embeddings (user/item/tag) with 4 init schemes, per-modality
projection MLPs, contrastive heads with learnable temperature, three fusion
strategies, configurable prediction MLP with BatchNorm — redesigned for XLA:

  * The scorer consumes *encoder outputs* (pooled vision/language features),
    not pixels/tokens. Frozen-encoder training reads features from
    device-resident tables; the unfrozen path composes a Flax encoder in front
    (encoders/). This keeps the reference's frozen-backbone semantics
    (multimodal.py:207-250) while making the scoring graph a small static
    dataflow program.
  * Which modalities exist is static per run (closure over the config), so
    each enabled-modality combination compiles once (SURVEY.md §7 hard parts).
  * BatchNorm batch statistics are computed with jnp.mean over the (possibly
    mesh-sharded) batch axis — under jit SPMD that mean is global, giving
    cross-replica synced BN for free.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..config import MODEL_CONFIGS, ModelConfig
from .layers import AttentionFusionLayer, GatedFusionLayer
from .losses import l2_normalize

# Modality ordering in the fusion stack. Matches the reference's
# features_to_fuse assembly order (multimodal.py:550-570): user, item, tag,
# then vision / language / numerical as enabled.
MODALITY_ORDER = ('user', 'item', 'tag', 'vision', 'language', 'numerical')


def activation_fn(name: str):
    """Activation registry (reference multimodal.py:150-167); relu fallback."""
    return {
        'relu': nn.relu,
        'gelu': nn.gelu,
        'tanh': nn.tanh,
        'leaky_relu': nn.leaky_relu,
        'silu': nn.silu,
    }.get(name.lower(), nn.relu)


def embedding_init(method: str):
    """Embedding-table initializer registry (reference multimodal.py:169-205).

    Maps the four torch init schemes to their JAX equivalents; unknown names
    fall back to xavier_uniform, like the reference.
    """
    inits = {
        'xavier_uniform': nn.initializers.xavier_uniform(),
        'xavier_normal': nn.initializers.xavier_normal(),
        'kaiming_uniform': nn.initializers.kaiming_uniform(),
        'kaiming_normal': nn.initializers.kaiming_normal(),
    }
    return inits.get(method.lower(), nn.initializers.xavier_uniform())


class ProjectionMLP(nn.Module):
    """Per-modality projection into the shared embedding space.

    One or two Dense layers (activation + dropout after each), depending on
    ``hidden_dim`` (reference multimodal.py:252-315).
    """
    out_dim: int
    hidden_dim: Optional[int]
    activation: str
    dropout_rate: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        act = activation_fn(self.activation)
        if self.hidden_dim:
            x = nn.Dense(self.hidden_dim, dtype=self.dtype)(x)
            x = act(x)
            x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        x = nn.Dense(self.out_dim, dtype=self.dtype)(x)
        x = act(x)
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        return x


class PredictionMLP(nn.Module):
    """Final scoring head: Dense->act->[BatchNorm]->Dropout per hidden layer,
    then Dense(1) + sigmoid/tanh/none (reference multimodal.py:366-386)."""
    hidden_dims: Sequence[int]
    activation: str
    use_batch_norm: bool
    dropout_rate: float
    final_activation: str
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        act = activation_fn(self.activation)
        x = x.astype(self.dtype)
        for h in self.hidden_dims:
            x = nn.Dense(h, dtype=self.dtype)(x)
            x = act(x)
            if self.use_batch_norm:
                # torch BatchNorm1d defaults: momentum 0.1 (flax: 0.9), eps 1e-5.
                x = nn.BatchNorm(use_running_average=not train,
                                 momentum=0.9, epsilon=1e-5, dtype=self.dtype)(x)
            x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        x = nn.Dense(1, dtype=jnp.float32)(x.astype(jnp.float32))
        if self.final_activation == 'sigmoid':
            x = nn.sigmoid(x)
        elif self.final_activation == 'tanh':
            x = nn.tanh(x)
        return x


class MultimodalRecommender(nn.Module):
    """Fuses ID embeddings with projected encoder features and scores pairs.

    All structural choices (which modalities, fusion type, MLP shape) are
    static attributes — each configuration is one compiled XLA program.
    """
    n_users: int
    n_items: int
    n_tags: int
    num_numerical_features: int
    embedding_dim: int = 128
    vision_feature_dim: Optional[int] = None      # raw encoder output dim
    language_feature_dim: Optional[int] = None
    clip_text_feature_dim: int = 512
    use_contrastive: bool = True
    dropout_rate: float = 0.3
    num_attention_heads: int = 4
    attention_dropout: float = 0.1
    fusion_hidden_dims: Tuple[int, ...] = (512, 256, 128)
    fusion_activation: str = 'relu'
    use_batch_norm: bool = True
    projection_hidden_dim: Optional[int] = None
    final_activation: str = 'sigmoid'
    init_method: str = 'xavier_uniform'
    contrastive_temperature: float = 0.07
    fusion_type: str = 'concatenate'
    vision_model_name: Optional[str] = None  # bookkeeping (checkpoint metadata)
    language_model_name: Optional[str] = None
    # Computation dtype for projections/fusion/MLP matmuls (params stay f32);
    # bfloat16 keeps the MXU fed on TPU. Final scores are always f32.
    dtype: Any = jnp.float32

    @property
    def contrastive_active(self) -> bool:
        # The reference silently restricts contrastive to CLIP vision
        # (multimodal.py:113); here that gating happens at construction via
        # build_model(), so this only checks a vision tower exists.
        return bool(self.use_contrastive and self.vision_feature_dim)

    @property
    def num_modalities(self) -> int:
        n = 3  # user, item, tag
        n += int(self.vision_feature_dim is not None)
        n += int(self.language_feature_dim is not None)
        n += int(self.num_numerical_features > 0)
        return n

    def setup(self):
        init = embedding_init(self.init_method)
        self.user_embedding = nn.Embed(self.n_users, self.embedding_dim,
                                       embedding_init=init, dtype=self.dtype)
        self.item_embedding = nn.Embed(self.n_items, self.embedding_dim,
                                       embedding_init=init, dtype=self.dtype)
        self.tag_embedding = nn.Embed(self.n_tags, self.embedding_dim,
                                      embedding_init=init, dtype=self.dtype)

        if self.vision_feature_dim:
            self.vision_projection = ProjectionMLP(
                self.embedding_dim, self.projection_hidden_dim,
                self.fusion_activation, self.dropout_rate, dtype=self.dtype)
        if self.language_feature_dim:
            self.language_projection = ProjectionMLP(
                self.embedding_dim, self.projection_hidden_dim,
                self.fusion_activation, self.dropout_rate, dtype=self.dtype)
        if self.num_numerical_features > 0:
            self.numerical_projection = ProjectionMLP(
                self.embedding_dim, self.projection_hidden_dim,
                self.fusion_activation, self.dropout_rate, dtype=self.dtype)

        if self.contrastive_active:
            self.vision_contrastive_projection = nn.Dense(self.embedding_dim)
            self.text_contrastive_projection = nn.Dense(self.embedding_dim)
            self.temperature = self.param(
                'temperature',
                lambda _key: jnp.asarray(self.contrastive_temperature, jnp.float32))

        if self.fusion_type == 'attention':
            self.fusion_layer = AttentionFusionLayer(
                embedding_dim=self.embedding_dim,
                num_attention_heads=self.num_attention_heads,
                dropout_rate=self.attention_dropout, dtype=self.dtype)
        elif self.fusion_type == 'gated':
            self.fusion_layer = GatedFusionLayer(
                embedding_dim=self.embedding_dim,
                num_modalities=self.num_modalities,
                dropout_rate=self.dropout_rate, dtype=self.dtype)
        elif self.fusion_type != 'concatenate':
            raise ValueError(f"Unknown fusion type: '{self.fusion_type}'")

        self.prediction_network = PredictionMLP(
            hidden_dims=tuple(self.fusion_hidden_dims),
            activation=self.fusion_activation,
            use_batch_norm=self.use_batch_norm,
            dropout_rate=self.dropout_rate,
            final_activation=self.final_activation,
            dtype=self.dtype)

    # ------------------------------------------------------------------ towers
    def modality_features(
        self,
        user_idx: jnp.ndarray,
        item_idx: jnp.ndarray,
        tag_idx: jnp.ndarray,
        vision_features: Optional[jnp.ndarray] = None,
        language_features: Optional[jnp.ndarray] = None,
        numerical_features: Optional[jnp.ndarray] = None,
        *, train: bool = False,
    ) -> List[jnp.ndarray]:
        """Per-modality embeddings in fusion order, each (B, D)."""
        feats = [
            self.user_embedding(user_idx),
            self.item_embedding(item_idx),
            self.tag_embedding(tag_idx),
        ]
        if self.vision_feature_dim and vision_features is not None:
            feats.append(self.vision_projection(vision_features, train=train))
        if self.language_feature_dim and language_features is not None:
            feats.append(self.language_projection(language_features, train=train))
        if self.num_numerical_features > 0 and numerical_features is not None:
            feats.append(self.numerical_projection(numerical_features, train=train))
        return feats

    def fuse(self, feats: List[jnp.ndarray], *, train: bool = False) -> jnp.ndarray:
        if self.fusion_type == 'concatenate':
            return jnp.concatenate(feats, axis=-1)
        stacked = jnp.stack(feats, axis=1)  # (B, M, D)
        return self.fusion_layer(stacked, train=train)

    # ----------------------------------------------------------------- forward
    def __call__(
        self,
        user_idx: jnp.ndarray,
        item_idx: jnp.ndarray,
        tag_idx: jnp.ndarray,
        vision_features: Optional[jnp.ndarray] = None,
        language_features: Optional[jnp.ndarray] = None,
        numerical_features: Optional[jnp.ndarray] = None,
        clip_text_features: Optional[jnp.ndarray] = None,
        *,
        train: bool = False,
        return_embeddings: bool = False,
    ):
        """Score user-item pairs; optionally return contrastive embeddings.

        ``clip_text_features`` are the pooled CLIP text-encoder outputs (the
        reference computes them from clip_text_input_ids in-forward,
        multimodal.py:472-487; here the encoder runs upstream).

        Returns (B, 1) scores, or with ``return_embeddings`` the tuple
        (scores, vision_contrastive, text_contrastive, projected_vision)
        matching reference multimodal.py:599-608 (contrastive embeddings are
        L2-normalized).
        """
        feats = self.modality_features(
            user_idx, item_idx, tag_idx, vision_features, language_features,
            numerical_features, train=train)
        fused = self.fuse(feats, train=train)
        out = self.prediction_network(fused, train=train)
        # NaN/Inf guard (reference multimodal.py:596-597).
        out = jnp.nan_to_num(out, nan=0.0, posinf=10.0, neginf=-10.0)

        if not return_embeddings:
            return out

        vis_contr = txt_contr = proj_vis = None
        if self.contrastive_active and vision_features is not None:
            vis_contr = l2_normalize(
                self.vision_contrastive_projection(vision_features))
            if clip_text_features is not None:
                txt_contr = l2_normalize(
                    self.text_contrastive_projection(clip_text_features))
            proj_vis = self.vision_projection(vision_features, train=train)
        return out, vis_contr, txt_contr, proj_vis

    # -------------------------------------------------------------- inference
    def get_item_embedding(
        self, item_idx: jnp.ndarray, vision_features: jnp.ndarray,
        language_features: jnp.ndarray, numerical_features: jnp.ndarray,
    ) -> jnp.ndarray:
        """Concatenated item representation for analysis
        (reference multimodal.py:613-639)."""
        parts = [self.item_embedding(item_idx)]
        if self.vision_feature_dim:
            parts.append(self.vision_projection(vision_features, train=False))
        if self.language_feature_dim:
            parts.append(self.language_projection(language_features, train=False))
        if self.num_numerical_features > 0:
            parts.append(self.numerical_projection(numerical_features, train=False))
        return jnp.concatenate(parts, axis=-1)

    def item_tower(
        self, item_idx: jnp.ndarray, tag_idx: jnp.ndarray,
        vision_features: Optional[jnp.ndarray] = None,
        language_features: Optional[jnp.ndarray] = None,
        numerical_features: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """Item-side modality embeddings stacked: (N, M_item, D).

        Used by the full-catalog scorer (inference/): item-side features are
        computed once per catalog, then broadcast against user rows.
        """
        feats = [self.item_embedding(item_idx), self.tag_embedding(tag_idx)]
        if self.vision_feature_dim and vision_features is not None:
            feats.append(self.vision_projection(vision_features, train=False))
        if self.language_feature_dim and language_features is not None:
            feats.append(self.language_projection(language_features, train=False))
        if self.num_numerical_features > 0 and numerical_features is not None:
            feats.append(self.numerical_projection(numerical_features, train=False))
        return jnp.stack(feats, axis=1)

    def user_tower(self, user_idx: jnp.ndarray) -> jnp.ndarray:
        return self.user_embedding(user_idx)

    def score_from_towers(self, user_emb: jnp.ndarray,
                          item_feats: jnp.ndarray) -> jnp.ndarray:
        """Score (B,D) users against (B,M_item,D) item stacks -> (B,1).

        Equivalent to __call__ in eval mode given precomputed towers; shared
        by the pairwise catalog scorer.
        """
        feats = [user_emb] + [item_feats[:, i] for i in range(item_feats.shape[1])]
        fused = self.fuse(feats, train=False)
        out = self.prediction_network(fused, train=False)
        return jnp.nan_to_num(out, nan=0.0, posinf=10.0, neginf=-10.0)


def build_model(model_config: ModelConfig, n_users: int, n_items: int,
                n_tags: int, num_numerical_features: int
                ) -> MultimodalRecommender:
    """Construct the scorer from a ModelConfig (the reference's __init__
    plumbing, multimodal.py:42-148, including the contrastive-requires-CLIP
    gate at :113)."""
    v = model_config.vision_model
    l = model_config.language_model
    vision_dim = MODEL_CONFIGS['vision'][v]['dim'] if v else None
    language_dim = MODEL_CONFIGS['language'][l]['dim'] if l else None
    clip_text_dim = MODEL_CONFIGS['vision']['clip'].get('text_dim', 512)
    return MultimodalRecommender(
        n_users=n_users,
        n_items=n_items,
        n_tags=n_tags,
        num_numerical_features=num_numerical_features,
        embedding_dim=model_config.embedding_dim,
        vision_feature_dim=vision_dim,
        language_feature_dim=language_dim,
        clip_text_feature_dim=clip_text_dim,
        use_contrastive=model_config.use_contrastive and v == 'clip',
        dropout_rate=model_config.dropout_rate,
        num_attention_heads=model_config.num_attention_heads,
        attention_dropout=model_config.attention_dropout,
        fusion_hidden_dims=tuple(model_config.fusion_hidden_dims),
        fusion_activation=model_config.fusion_activation,
        use_batch_norm=model_config.use_batch_norm,
        projection_hidden_dim=model_config.projection_hidden_dim,
        final_activation=model_config.final_activation,
        init_method=model_config.init_method,
        contrastive_temperature=model_config.contrastive_temperature,
        fusion_type=model_config.fusion_type,
        vision_model_name=v,
        language_model_name=l,
    )


# Backward-compatibility alias (reference multimodal.py:675).
PretrainedMultimodalRecommender = MultimodalRecommender
