"""Training CLI — same flags and behavior as the reference train.py
(/root/reference/train.py:1-103): arg-resolution precedence
RESTART_DIRECTORY > PARAMETERS > TESTING > defaults, training-directory
creation, config-JSON persistence, Adam training with validation checkpoints.

TPU-native: the train step is a single jitted multi-stage update, optionally
data-parallel over a jax.sharding.Mesh (`--MESH data` to shard the batch over
all visible devices).
"""
import os
from datetime import datetime

import jax

from minimagen_tpu.models.imagen import Imagen
from minimagen_tpu.models.unet import Base, BaseTest, Super, SuperTest, Unet
from minimagen_tpu.utils.platform import respect_jax_platforms_env
from minimagen_tpu.generate import load_minimagen, load_params
from minimagen_tpu.parallel.mesh import make_mesh, make_optimizer
from minimagen_tpu.training import (
    ConceptualCaptions,
    DataLoader,
    MinimagenCollator,
    MinimagenTrain,
    create_directory,
    get_default_args,
    get_minimagen_dl_opts,
    get_minimagen_parser,
    get_model_params,
    get_model_size,
    imagen_config_dict,
    load_restart_training_parameters,
    load_testing_parameters,
    save_training_info,
)


def main():
    respect_jax_platforms_env()
    parser = get_minimagen_parser()
    # extra args beyond the reference parser (train.py:22-23 adds TIMESTAMP)
    parser.add_argument("-ts", "--TIMESTAMP", dest="timestamp",
                        help="Timestamp for training directory", type=str, default=None)
    parser.add_argument("--MESH", dest="MESH", choices=["none", "data"], default="none",
                        help="Data-parallel over all visible devices ('data') or single device")
    parser.add_argument("--BF16", dest="BF16", action="store_true",
                        help="bfloat16 compute (f32 params/norms/softmax)")
    parser.add_argument("--REMAT", dest="REMAT", action="store_true",
                        help="Rematerialize U-Net blocks (activation memory for ~30% recompute)")
    parser.add_argument("--MU_DTYPE", dest="MU_DTYPE", choices=["f32", "bf16"],
                        default="f32",
                        help="Adam first-moment dtype; bf16 halves the m-buffer "
                             "HBM traffic in the bandwidth-bound update fusions "
                             "(measured train recipe, docs/SERVING.md)")
    parser.add_argument("--MIN_SNR_GAMMA", dest="MIN_SNR_GAMMA", type=float, default=None,
                        help="Min-SNR loss weighting gamma (arXiv 2303.09556): "
                             "per-sample losses weighted by min(SNR(t), gamma)/SNR(t); "
                             "paper recommends 5. Default None = the reference's "
                             "unweighted loss. Persisted in the run's imagen config "
                             "JSON, so restarts inherit it.")
    parser.add_argument("--OFFSET_NOISE", dest="OFFSET_NOISE", type=float, default=None,
                        help="Offset-noise scale: adds a per-(sample, channel) "
                             "bias scale*N(0,1) to the forward-process noise "
                             "(and target), teaching the model to move the "
                             "image mean — enables very dark/bright samples. "
                             "Common range 0.05-0.15. Default None/0 = exact "
                             "reference forward process. Persisted in the "
                             "run's imagen config JSON.")
    parser.add_argument("--ZERO1", dest="ZERO1", choices=["on", "off", "fsdp"],
                        default="on",
                        help="Optimizer/param sharding over the 'data' mesh axis "
                             "(mesh runs only; numerics identical): 'on' = ZeRO-1 "
                             "(Adam moments/EMA sharded, 1/N optimizer HBM per "
                             "chip); 'fsdp' = ZeRO-3 (params sharded too, "
                             "gather-at-use, ~1/N total state memory per chip)")
    args = parser.parse_args()
    timestamp = args.timestamp or datetime.now().strftime("%Y%m%d_%H%M%S")

    dir_path = f"./training_{timestamp}"
    training_dir = create_directory(dir_path)

    # arg-resolution precedence (reference train.py:36-43)
    if args.RESTART_DIRECTORY is not None:
        args = load_restart_training_parameters(args)
    elif args.PARAMETERS is not None:
        args = load_restart_training_parameters(args, justparams=True)
    if args.TESTING:
        args = load_testing_parameters(args)
        train_dataset, valid_dataset = ConceptualCaptions(args, smalldata=True)
    else:
        train_dataset, valid_dataset = ConceptualCaptions(args, smalldata=False)

    dl_opts = {**get_minimagen_dl_opts(None), "batch_size": args.BATCH_SIZE,
               "num_workers": args.NUM_WORKERS,
               "collate_fn": MinimagenCollator(max_length=args.MAX_NUM_WORDS)}
    train_dataloader = DataLoader(train_dataset, **dl_opts)
    valid_dataloader = DataLoader(valid_dataset, **dl_opts)

    # build Unet configs + Imagen (reference train.py:54-87)
    if args.RESTART_DIRECTORY is None:
        imagen_params = dict(
            image_sizes=(int(args.IMG_SIDE_LEN / 2), args.IMG_SIDE_LEN),
            timesteps=args.TIMESTEPS,
            cond_drop_prob=0.15,
            text_encoder_name=args.T5_NAME,
        )
        if args.TESTING:
            unets_params = [get_default_args(BaseTest), get_default_args(SuperTest)]
        elif not args.PARAMETERS:
            unets_params = [get_default_args(Base), get_default_args(Super)]
        else:
            unets_params, imagen_params = get_model_params(args.PARAMETERS)
            imagen_params = {k: v for k, v in imagen_params.items() if k != "unets"}
        if args.MIN_SNR_GAMMA is not None:  # CLI overrides any JSON value
            imagen_params["min_snr_gamma"] = args.MIN_SNR_GAMMA
        if args.OFFSET_NOISE is not None:
            imagen_params["offset_noise_scale"] = args.OFFSET_NOISE

        unets = [Unet.from_dict(p) for p in unets_params]
        import jax.numpy as jnp
        extra = dict(dtype=jnp.bfloat16 if args.BF16 else jnp.float32, remat=args.REMAT)
        imagen = Imagen(unets=unets, **imagen_params, **extra)
        imagen.init_params(jax.random.PRNGKey(0))
    else:
        orig_train_dir = os.path.join(os.getcwd(), args.RESTART_DIRECTORY)
        unets_params, imagen_params = load_params(orig_train_dir)
        imagen_params = {k: v for k, v in imagen_params.items() if k != "unets"}
        imagen = load_minimagen(orig_train_dir)
        # CLI lever overrides apply on restarts too (same precedence as the
        # fresh-start branch: CLI > saved JSON), with the ctor's validation
        if args.MIN_SNR_GAMMA is not None or args.OFFSET_NOISE is not None:
            imagen.set_training_levers(min_snr_gamma=args.MIN_SNR_GAMMA,
                                       offset_noise_scale=args.OFFSET_NOISE)
            imagen_params["min_snr_gamma"] = imagen.min_snr_gamma
            imagen_params["offset_noise_scale"] = imagen.offset_noise_scale
    unets = imagen.unet_configs

    # complete config dicts with defaults (reference train.py:89-91)
    unets_params = [cfg.to_dict() for cfg in imagen.unet_configs]
    imagen_params = imagen_config_dict(imagen_params)

    model_size_MB = get_model_size(imagen)
    save_training_info(args, timestamp, unets_params, imagen_params, model_size_MB, training_dir)

    mesh = make_mesh() if args.MESH == "data" else None
    import jax.numpy as jnp  # noqa: F811
    optimizer = make_optimizer(args.OPTIM_LR, args.ACCUM_ITER,
                               mu_dtype=jnp.bfloat16 if args.MU_DTYPE == "bf16" else None)
    MinimagenTrain(timestamp, args, unets, imagen, train_dataloader, valid_dataloader,
                   training_dir, optimizer, timeout=30, mesh=mesh)


if __name__ == "__main__":
    main()
