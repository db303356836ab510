"""Inference/persistence API: rebuild an Imagen from a training directory and
generate+save images.

Capability parity with the reference (/root/reference/minimagen/generate.py —
SURVEY.md §2b rows S/T):

- `load_params(directory)`: read sorted `unet_<i>_params_*.json` +
  `imagen_params_*.json` from `<dir>/parameters` (generate.py:49-67).
- `load_minimagen(directory)`: rebuild Imagen(unets=[...], **imagen_params)
  and load per-unet checkpoints from `state_dicts/`, falling back to `tmp/`
  if empty, raising if both are empty (generate.py:79-121).
- `sample_and_save(captions, ...)`: timestamped `generated_images_<ts>/`
  output directory (error if exists non-empty), provenance files
  captions.txt + imagen_training_directory.txt, `generated_images/
  image_<idx>.<filetype>` outputs (generate.py:124-173).

Checkpoints are flax msgpack trees (`.ckpt`); loading also recognizes the
reference's `.pth` naming pattern to give a clear error instead of silence.
"""
from __future__ import annotations

import json
import os
from contextlib import contextmanager
from datetime import datetime
from typing import List, Optional

import jax

from .models.imagen import Imagen
from .models.unet import UnetConfig
from .training import load_unet_checkpoint


def _create_directory(dir_path: str):
    """Output directory context manager for generated images
    (reference generate.py:12-30)."""
    original_dir = os.getcwd()
    img_path = os.path.join(original_dir, dir_path, "generated_images")
    if not os.path.exists(img_path):
        os.makedirs(img_path)
    elif len(os.listdir(img_path)) != 0:
        raise FileExistsError(f"The directory {img_path} already exists and is nonempty")

    @contextmanager
    def cm(subdir: str = ""):
        os.chdir(os.path.join(original_dir, dir_path, subdir))
        try:
            yield
        finally:
            os.chdir(original_dir)

    return cm


def _read_params(directory: str, filename: str) -> dict:
    with open(os.path.join(directory, "parameters", filename), "r") as f:
        return json.loads(f.read())


def load_params(directory: str):
    """Load Unet and Imagen config dicts from a training directory
    (reference generate.py:49-67)."""
    files = os.listdir(os.path.join(directory, "parameters"))
    unets_params_files = sorted(
        [f for f in files if f.startswith("unet_")], key=lambda x: int(x.split("_")[1])
    )
    unets_params = [_read_params(directory, f) for f in unets_params_files]
    imagen_params_file = [f for f in files if f.startswith("imagen_")][0]
    imagen_params = _read_params(directory, imagen_params_file)
    return unets_params, imagen_params


def _instantiate_minimagen(directory: str) -> Imagen:
    """Rebuild an Imagen instance from saved configs (reference
    `_instatiate_minimagen` [sic], generate.py:70-76)."""
    unets_params, imagen_params = load_params(directory)
    imagen_params = {k: v for k, v in imagen_params.items() if k != "unets"}
    return Imagen(unets=[UnetConfig.from_dict(p) for p in unets_params], **imagen_params)


def load_minimagen(directory: str) -> Imagen:
    """Load a MinImagen instance (configs + weights) from a training
    directory (reference generate.py:79-121)."""
    minimagen = _instantiate_minimagen(directory)
    # initialize to get the param-tree structure as a template for msgpack
    minimagen.init_params(jax.random.PRNGKey(0))

    def _load_from(subdir: str) -> bool:
        files = os.listdir(os.path.join(directory, subdir))
        unet_files = [f for f in files if f.startswith("unet_")]
        if not unet_files:
            return False
        num_unets = int(max({f.split("_")[1] for f in unet_files})) + 1
        for i in range(num_unets):
            candidates = sorted(f for f in unet_files if f.startswith(f"unet_{i}"))
            path = os.path.join(directory, subdir, candidates[0])
            if path.endswith(".pth"):
                # a torch checkpoint from the PyTorch reference: convert in
                # place (tools/torch_import proves output equivalence)
                import torch  # noqa: PLC0415

                from .tools.torch_import import convert_unet_state_dict  # noqa: PLC0415

                sd = torch.load(path, map_location="cpu", weights_only=True)
                minimagen.params[f"unet_{i}"] = convert_unet_state_dict(
                    sd, minimagen.unet_configs[i]
                )
            else:
                minimagen.params[f"unet_{i}"] = load_unet_checkpoint(
                    path, minimagen.params[f"unet_{i}"]
                )
        return True

    if not _load_from("state_dicts"):
        print(f'\n"state_dicts" folder in {directory} is empty, using the most '
              f'recent checkpoint from "tmp".\n')
        if not _load_from("tmp"):
            raise ValueError(
                f'Both "/state_dicts" and "/tmp" in {directory} are empty. Train '
                f"the model to acquire state dictionaries for inference."
            )
    return minimagen


def sample_and_save(
    captions: List[str],
    *,
    minimagen: Optional[Imagen] = None,
    training_directory: Optional[str] = None,
    sample_args: Optional[dict] = None,
    save_directory: Optional[str] = None,
    filetype: str = "png",
) -> None:
    """Generate and save images for captions (reference generate.py:124-173).

    Images are saved to `<save_directory>/generated_images/image_<idx>.<filetype>`
    with captions.txt + imagen_training_directory.txt provenance files.
    """
    sample_args = dict(sample_args or {})
    assert not (minimagen is None and training_directory is None), \
        "Must supply either a training directory or MinImagen instance."
    assert (minimagen is not None) ^ (training_directory is not None), \
        "Cannot supply both a MinImagen instance and a training directory"

    if save_directory is None:
        save_directory = datetime.now().strftime("generated_images_%Y%m%d_%H%M%S")

    cm = _create_directory(save_directory)

    with cm():
        with open("captions.txt", "w") as f:
            for caption in captions:
                f.write(f"{caption}\n")
        if training_directory is not None:
            with open("imagen_training_directory.txt", "w") as f:
                f.write(training_directory)

    if training_directory is not None:
        minimagen = load_minimagen(training_directory)

    images = minimagen.sample(texts=captions, return_pil_images=True, **sample_args)

    with cm("generated_images"):
        for idx, img in enumerate(images):
            img.save(f"image_{idx}.{filetype}")
