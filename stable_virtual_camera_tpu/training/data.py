"""Scene -> TrainBatch data pipeline.

The reference repo is inference-only (SURVEY.md §1: no training code). This
module closes the fine-tuning loop from a parsed scene on disk to the jitted
train step: sample a T-frame chunk from a `data.Dataset`, build the SAME
conditioning tensors the sampler consumes at inference (the engine assembles
them per chunk for sampling — reference seva/eval.py:1152-1281):

  concat    = input-frame mask map ++ Plücker embedding   (T, h, w, 7)
  dense     = Plücker FiLM map                            (T, h, w, 6)
  crossattn = averaged CLIP embedding of the input views  (T, 1, ctx)

and supervise epsilon-prediction on the clean VAE latents of ALL frames,
with the input views masked out of the loss by default (they are
replace-conditioned at inference, so their pixels are never generated).

Everything here is host-side numpy plus the already-jitted VAE/CLIP
appliers; `device_prefetch` overlaps the host work (image IO, resize, VAE
encode, CLIP) with the device's train step via a bounded background queue —
the TPU-idiomatic input pipeline (no per-step host stalls).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator

import jax
import numpy as np

from stable_virtual_camera_tpu.core.transforms import transform_img_and_K
from stable_virtual_camera_tpu.data.dataset import Dataset
from stable_virtual_camera_tpu.engine.value_dict import (
    ChunkValues,
    build_chunk_values,
)
from stable_virtual_camera_tpu.training.train_step import TrainBatch


def train_batch_from_values(
    vae,
    clip,
    values: ChunkValues,
    encoding_t: int | None = 0,
    mask_inputs: bool = True,
) -> TrainBatch:
    """ChunkValues -> TrainBatch: clean latents of all frames as the
    regression space, conditioning tensors exactly as the sampler sees them
    (engine.runner.build_chunk_conditioning builds the CFG-doubled variant of
    the same quantities for inference)."""
    T = values.imgs.shape[0]
    h, w = values.plucker.shape[1:3]
    mask = values.input_frame_mask

    latents = np.asarray(vae.encode(values.imgs, encoding_t), np.float32)
    clip_emb = np.asarray(clip.embed(values.imgs_clip[mask]), np.float32).mean(0)
    crossattn = np.tile(clip_emb[None, None], (T, 1, 1)).astype(np.float32)

    mask_map = np.broadcast_to(
        mask[:, None, None, None].astype(np.float32), (T, h, w, 1)
    )
    plucker = values.plucker.astype(np.float32)
    concat = np.concatenate([mask_map, plucker], axis=-1)

    loss_mask = (
        (~mask).astype(np.float32) if mask_inputs else np.ones(T, np.float32)
    )
    return TrainBatch(
        latents=latents,
        concat=concat,
        crossattn=crossattn,
        dense=plucker,
        loss_mask=loss_mask,
    )


class SceneChunkSampler:
    """Random T-frame training chunks from a parsed scene.

    Each sample draws `num_frames` distinct views, places `num_input_frames`
    of them first (the engine's chunk layout: camera-known slots lead, and
    the Plücker source is slot 0 — build_chunk_values requires it), resizes
    everything to the model resolution with intrinsics tracking, and centers/
    scale-normalizes the cameras against the FULL scene exactly as the
    engine does per chunk."""

    def __init__(
        self,
        dataset: Dataset,
        num_frames: int,
        num_input_frames: int,
        image_size: tuple[int, int],  # (W, H) model resolution
        camera_scale: float = 2.0,
    ):
        assert 0 < num_input_frames < num_frames
        self.dataset = dataset
        self.num_frames = num_frames
        self.num_input_frames = num_input_frames
        self.image_size = image_size
        self.camera_scale = camera_scale
        # Full-scene cameras drive the robust centering (same quantile filter
        # the engine applies — value_dict.build_chunk_values).
        self.all_c2ws = np.asarray(dataset.parser.camtoworlds)

    def _load_view(self, item: int):
        d = self.dataset[item]
        img = np.asarray(d["image"], np.float32)
        if img.max() > 1.5:  # Dataset returns raw 0..255 floats
            img = img / 255.0
        img = img * 2.0 - 1.0
        W, H = self.image_size
        img, K = transform_img_and_K(img[None], (W, H), K=d["K"][None])
        K = K[0].copy()
        K[0] /= W
        K[1] /= H
        return img[0], K, d["camtoworld"]

    def sample(self, rng: np.random.Generator) -> ChunkValues:
        n = len(self.dataset)
        idx = rng.choice(n, size=self.num_frames, replace=n < self.num_frames)
        idx = np.sort(idx)
        # Input views lead the chunk (slot 0 is the Plücker source frame).
        input_pos = np.sort(
            rng.choice(self.num_frames, size=self.num_input_frames, replace=False)
        )
        order = np.concatenate(
            [input_pos, np.setdiff1d(np.arange(self.num_frames), input_pos)]
        )
        imgs, Ks, c2ws = [], [], []
        for i in idx[order]:
            img, K, c2w = self._load_view(int(i))
            imgs.append(img)
            Ks.append(K)
            c2ws.append(c2w)
        k = self.num_input_frames
        return build_chunk_values(
            np.stack(imgs),
            np.stack(imgs),
            list(range(k)),
            np.stack(c2ws),
            np.stack(Ks),
            list(range(k)),
            self.all_c2ws,
            camera_scale=self.camera_scale,
        )

    def batches(
        self,
        vae,
        clip,
        seed: int = 0,
        encoding_t: int | None = 0,
        mask_inputs: bool = True,
    ) -> Iterator[TrainBatch]:
        """Infinite TrainBatch stream (host-side; wrap in device_prefetch)."""
        rng = np.random.default_rng(seed)
        while True:
            yield train_batch_from_values(
                vae,
                clip,
                self.sample(rng),
                encoding_t=encoding_t,
                mask_inputs=mask_inputs,
            )


def device_prefetch(
    batches: Iterable[TrainBatch], size: int = 2
) -> Iterator[TrainBatch]:
    """Overlap host batch construction with device compute: a background
    thread builds batches and `jax.device_put`s them `size` deep ahead of
    consumption. The bounded queue bounds host memory; exceptions in the
    producer re-raise at the consumer."""
    q: queue.Queue = queue.Queue(maxsize=size)
    _END, _ERR = object(), object()

    def _produce():
        try:
            for b in batches:
                q.put(jax.device_put(b))
            q.put(_END)
        except BaseException as e:  # noqa: BLE001 — re-raised at the consumer
            q.put((_ERR, e))

    t = threading.Thread(target=_produce, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            return
        if isinstance(item, tuple) and len(item) == 2 and item[0] is _ERR:
            raise item[1]
        yield item
