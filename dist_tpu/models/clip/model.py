"""CLIP vision + text towers, TPU-native.

Functional rebuild of the reference's CLIP (``models/base/clip.py:218-533``):

- the transformer stack is a single ``nn.scan`` over stacked per-layer
  params — one compiled block body instead of 12/24 unrolled blocks, and the
  per-layer mid-feature taps fall out as the scan's stacked ``ys`` (replacing
  the reference's mutating ``others['mid_feat']['img'][layer_id]`` protocol,
  ``clip.py:151-178``),
- sparse frame sampling (keep every ``alpha``-th frame before the expensive
  tower, ``clip.py:281-284``) happens on the batched frame axis,
- activations are NLD (batch-major); LayerNorm/softmax run in fp32 under
  bf16 compute (``clip.py:181-187``),
- architecture hyperparameters are sniffed from checkpoint shapes exactly
  like the reference builder (``clip.py:564-611``).

The frozen towers are evaluated under ``jax.lax.stop_gradient`` by the
caller; with no gradient tap, XLA drops the entire backward graph of the
tower (the reference needed ``torch.no_grad`` + DDP
``find_unused_parameters=True`` for the same effect).
"""

import dataclasses
import flax.linen as nn
import jax
import jax.numpy as jnp

from dist_tpu.models.base.blocks import (
    LayerNorm,
    ResidualAttentionBlock,
)


@dataclasses.dataclass(frozen=True)
class CLIPArchitecture:
    """Shape-derived CLIP hyperparameters (reference clip.py:564-598)."""

    embed_dim: int
    image_resolution: int
    vision_layers: int
    vision_width: int
    vision_patch_size: int
    context_length: int
    vocab_size: int
    transformer_width: int
    transformer_heads: int
    transformer_layers: int

    @property
    def vision_heads(self):
        return self.vision_width // 64

    @property
    def grid_size(self):
        return self.image_resolution // self.vision_patch_size


def sniff_architecture(state_dict) -> CLIPArchitecture:
    """Infer architecture from a (torch-named) state dict's shapes, the same
    key math as the reference builder (clip.py:564-598). Works on any mapping
    from torch key names to shaped arrays."""
    assert "visual.proj" in state_dict, (
        "only ViT CLIP variants are supported (the reference's DiST/TAda "
        "projects never use the ResNet CLIP tower)"
    )
    vision_width = state_dict["visual.conv1.weight"].shape[0]
    vision_layers = len([
        k for k in state_dict
        if k.startswith("visual.") and k.endswith(".attn.in_proj_weight")
    ])
    vision_patch_size = state_dict["visual.conv1.weight"].shape[-1]
    grid_size = round(
        (state_dict["visual.positional_embedding"].shape[0] - 1) ** 0.5
    )
    image_resolution = vision_patch_size * grid_size
    embed_dim = state_dict["text_projection"].shape[1]
    context_length = state_dict["positional_embedding"].shape[0]
    vocab_size = state_dict["token_embedding.weight"].shape[0]
    transformer_width = state_dict["ln_final.weight"].shape[0]
    transformer_layers = len(set(
        k.split(".")[2] for k in state_dict
        if k.startswith("transformer.resblocks")
    ))
    return CLIPArchitecture(
        embed_dim=embed_dim,
        image_resolution=image_resolution,
        vision_layers=vision_layers,
        vision_width=vision_width,
        vision_patch_size=vision_patch_size,
        context_length=context_length,
        vocab_size=vocab_size,
        transformer_width=transformer_width,
        transformer_heads=transformer_width // 64,
        transformer_layers=transformer_layers,
    )


# well-known architectures, so models can be built without a checkpoint
ARCHITECTURES = {
    "ViT-B-32": CLIPArchitecture(512, 224, 12, 768, 32, 77, 49408, 512, 8, 12),
    "ViT-B-16": CLIPArchitecture(512, 224, 12, 768, 16, 77, 49408, 512, 8, 12),
    "ViT-L-14": CLIPArchitecture(768, 224, 24, 1024, 14, 77, 49408, 768, 12, 12),
    # tiny architecture for smoke tests / CPU pipelines
    "ViT-Test": CLIPArchitecture(32, 64, 2, 64, 16, 77, 49408, 64, 1, 2),
}


class _ScanBlock(nn.Module):
    """Scan body: one residual block; emits its output as a tap."""

    num_heads: int
    causal: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, carry, _):
        x = ResidualAttentionBlock(
            self.num_heads, causal=self.causal, dtype=self.dtype, name="block"
        )(carry)
        return x, x


def transformer_stack(x, layers, num_heads, causal, dtype, name="resblocks",
                      collect_taps=True, remat=False, parent=None,
                      pipe_stages=1, pipe_microbatches=0):
    """Scanned transformer; returns (final_x, taps[(layers, B, L, D)]).

    ``remat=True`` wraps the scan body in ``nn.remat`` so only the per-layer
    inputs are kept alive for the backward (jax.checkpoint — the
    FLOPs-for-HBM trade for 32+64f ViT-L training; SURVEY section 7.3).

    ``pipe_stages > 1`` (with ``parent`` = the calling module): run the SAME
    stacked params through the GPipe schedule of
    ``parallel/pipeline.py`` instead of the sequential scan — the layer axis
    shards over the mesh's ``pipe`` axis. Init still traces the scan (it
    creates the params); only apply takes the pipelined path, so checkpoints
    and param trees are identical either way."""
    if (pipe_stages > 1 and parent is not None
            and not parent.is_initializing()):
        from dist_tpu.parallel.pipeline import current_mesh, pipeline_stack

        mesh = current_mesh()
        assert mesh is not None and int(
            mesh.shape.get("pipe", 1)) == pipe_stages, (
            f"TPU.MESH.PIPE={pipe_stages} needs the jit entered under "
            f"`with mesh:` whose pipe axis is {pipe_stages} "
            f"(got {None if mesh is None else dict(mesh.shape)})")
        stacked = parent.scope.get_variable("params", name)
        block = ResidualAttentionBlock(num_heads, causal=causal, dtype=dtype)

        def body(p, c):
            return block.apply({"params": p["block"]}, c)

        if remat:
            body = jax.checkpoint(body)
        return pipeline_stack(body, stacked, x, mesh=mesh,
                              n_microbatches=pipe_microbatches,
                              collect_taps=collect_taps)
    body = nn.remat(_ScanBlock) if remat else _ScanBlock
    Blocks = nn.scan(
        body,
        variable_axes={"params": 0},
        split_rngs={"params": True},
        length=layers,
    )
    x, taps = Blocks(
        num_heads=num_heads, causal=causal, dtype=dtype, name=name
    )(x, None)
    return x, (taps if collect_taps else None)


class VisionTransformer(nn.Module):
    """CLIP ViT tower over batched video frames (clip.py:218-300).

    Input: frames (B, T, H, W, 3) channels-last, already normalized.
    Applies sparse sampling (keep every ``sparse_alpha``-th frame) before
    the transformer, then runs the scanned stack.

    Returns (cls_x, x_logits, taps):
      cls_x    (B*t, embed_dim)  projected cls embedding per sparse frame
      x_logits (B*t, width)      ln_post(cls) pre-projection
      taps     (layers, B*t, L, width) per-layer block outputs
    """

    arch: CLIPArchitecture
    num_frames: int
    sparse_alpha: int = 1
    dtype: jnp.dtype = jnp.float32
    remat: bool = False
    pipe_stages: int = 1        # TPU.MESH.PIPE: pipeline the layer axis
    pipe_microbatches: int = 0  # TPU.PIPE_MICROBATCHES (0 = one per stage)

    @nn.compact
    def __call__(self, frames, collect_taps=True):
        a = self.arch
        b, t_all = frames.shape[0], frames.shape[1]
        x = frames.reshape((-1,) + frames.shape[2:]).astype(self.dtype)
        x = nn.Conv(
            a.vision_width,
            kernel_size=(a.vision_patch_size, a.vision_patch_size),
            strides=(a.vision_patch_size, a.vision_patch_size),
            use_bias=False, padding="VALID",
            dtype=self.dtype, param_dtype=jnp.float32, name="conv1",
        )(x)
        x = x.reshape(x.shape[0], -1, a.vision_width)  # (B*T, grid^2, width)

        class_embedding = self.param(
            "class_embedding",
            nn.initializers.normal(stddev=a.vision_width ** -0.5),
            (a.vision_width,), jnp.float32,
        )
        positional_embedding = self.param(
            "positional_embedding",
            nn.initializers.normal(stddev=a.vision_width ** -0.5),
            (a.grid_size ** 2 + 1, a.vision_width), jnp.float32,
        )
        cls = jnp.broadcast_to(
            class_embedding.astype(self.dtype), (x.shape[0], 1, a.vision_width)
        )
        x = jnp.concatenate([cls, x], axis=1)
        x = x + positional_embedding.astype(self.dtype)
        x = LayerNorm(name="ln_pre")(x)

        if self.sparse_alpha > 1:
            # keep frames 0, alpha, 2*alpha, ... (clip.py:281-284)
            l, c = x.shape[1], x.shape[2]
            x = x.reshape(b, t_all, l, c)[:, ::self.sparse_alpha]
            x = x.reshape(-1, l, c)

        x, taps = transformer_stack(
            x, a.vision_layers, a.vision_heads, causal=False,
            dtype=self.dtype, name="resblocks", collect_taps=collect_taps,
            remat=self.remat, parent=self, pipe_stages=self.pipe_stages,
            pipe_microbatches=self.pipe_microbatches,
        )

        x_logits = LayerNorm(name="ln_post")(x[:, 0, :])
        proj = self.param(
            "proj", nn.initializers.normal(stddev=a.vision_width ** -0.5),
            (a.vision_width, a.embed_dim), jnp.float32,
        )
        cls_x = x_logits @ proj.astype(x_logits.dtype)
        return cls_x, x_logits, taps


class TextTransformer(nn.Module):
    """CLIP text tower (clip.py:419-435). Input: int tokens (N, 77)."""

    arch: CLIPArchitecture
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, text):
        a = self.arch
        token_embedding = self.param(
            "token_embedding", nn.initializers.normal(stddev=0.02),
            (a.vocab_size, a.transformer_width), jnp.float32,
        )
        positional_embedding = self.param(
            "positional_embedding", nn.initializers.normal(stddev=0.01),
            (a.context_length, a.transformer_width), jnp.float32,
        )
        x = token_embedding[text].astype(self.dtype)
        x = x + positional_embedding.astype(self.dtype)
        x, _ = transformer_stack(
            x, a.transformer_layers, a.transformer_heads, causal=True,
            dtype=self.dtype, name="resblocks", collect_taps=False,
        )
        # eot token = highest token id in each sequence (clip.py:429)
        eot = jnp.argmax(text, axis=-1)
        x_logits = x[jnp.arange(x.shape[0]), eot]
        x = LayerNorm(name="ln_final")(x_logits)
        text_projection = self.param(
            "text_projection",
            nn.initializers.normal(stddev=a.transformer_width ** -0.5),
            (a.transformer_width, a.embed_dim), jnp.float32,
        )
        return x @ text_projection.astype(x.dtype), x_logits
