"""Inference CLI — same flags and behavior as the reference inference.py
(/root/reference/inference.py:1-29): --CAPTIONS (single string or .txt file of
lines, default "a happy dog") + --TRAINING_DIRECTORY, sampling at
cond_scale=3.
"""
from argparse import ArgumentParser

from minimagen_tpu.utils.platform import respect_jax_platforms_env
from minimagen_tpu.generate import sample_and_save


def main():
    respect_jax_platforms_env()
    parser = ArgumentParser()
    parser.add_argument("-c", "--CAPTIONS", dest="CAPTIONS",
                        help="Single caption to generate for or filepath for .txt file of captions to generate for",
                        default=None, type=str)
    parser.add_argument("-d", "--TRAINING_DIRECTORY", dest="TRAINING_DIRECTORY",
                        help="Training directory to use for inference", type=str)
    # beyond the reference CLI: fast strided sampling
    parser.add_argument("--SAMPLER", dest="SAMPLER", choices=["ddpm", "ddim", "dpmpp", "unipc"], default="ddpm",
                        help="ddpm = reference-faithful full-T sampling; ddim = strided fast "
                             "path; dpmpp = DPM-Solver++(2M), ~half the steps at equal quality")
    parser.add_argument("--SAMPLE_STEPS", dest="SAMPLE_STEPS", default=None,
                        type=lambda v: (tuple(int(s) for s in v.split(","))
                                        if "," in v else int(v)),
                        help="Number of DDIM steps (default min(50, T)); a "
                             "comma list sets per-stage budgets, e.g. '50,20' "
                             "— SR stages need far fewer steps than the base")
    parser.add_argument("--GRID", dest="GRID", choices=["time", "lambda", "karras"], default="time",
                        help="strided-sampler timestep spacing: 'time' (even "
                             "timesteps, DDIM default) or 'lambda' (even log-SNR "
                             "steps, the DPM-Solver grid — better at small budgets)")
    parser.add_argument("--CACHE_INTERVAL", dest="CACHE_INTERVAL", default=None,
                        type=lambda v: v if v == "auto" else int(v),
                        help="encoder-feature caching: recompute the U-Net down path "
                             "every N-th sampler step and reuse it in between "
                             "(Faster Diffusion; 0/1 = off, exact numerics; "
                             "'auto' = per-stage cost model — the library default)")
    parser.add_argument("--GUIDANCE_RESCALE", dest="GUIDANCE_RESCALE", type=float, default=0.0,
                        help="CFG rescale phi (arXiv 2305.08891): pulls the guided "
                             "prediction's std back to the conditional one's, fixing "
                             "the overexposure large cond_scale causes; 0 = exact "
                             "reference combine, 0.5-0.7 recommended at high scales")
    parser.add_argument("--SEED", dest="SEED", type=int, default=None,
                        help="PRNG seed for reproducible samples (default: fresh "
                             "entropy per run, like the reference)")
    parser.add_argument("--MESH", dest="MESH", choices=["none", "data"], default="none",
                        help="multi-chip serving: 'data' shards the caption batch "
                             "over all devices (requires len(captions) divisible "
                             "by the device count; numerics identical to 'none')")
    args = parser.parse_args()

    if args.CAPTIONS is None:
        print('\nNo caption supplied - using the default of "a happy dog".\n')
        captions = ["a happy dog"]
    elif not args.CAPTIONS.endswith(".txt"):
        captions = [args.CAPTIONS]
    else:
        with open(args.CAPTIONS, "r") as f:
            lines = f.readlines()
        captions = [line[:-1] if line.endswith("\n") else line for line in lines]

    sample_args = {"cond_scale": 3.0, "sampler": args.SAMPLER, "progress": True,
                   "grid": args.GRID}
    if args.SAMPLE_STEPS is not None:
        sample_args["sample_steps"] = args.SAMPLE_STEPS
    if args.CACHE_INTERVAL is not None:
        sample_args["cache_interval"] = args.CACHE_INTERVAL
    if args.GUIDANCE_RESCALE:
        sample_args["guidance_rescale"] = args.GUIDANCE_RESCALE
    if args.SEED is not None:
        import jax
        sample_args["key"] = jax.random.PRNGKey(args.SEED)
    if args.MESH == "data":
        from minimagen_tpu.parallel.mesh import make_mesh
        sample_args["mesh"] = make_mesh()
    sample_and_save(captions, training_directory=args.TRAINING_DIRECTORY,
                    sample_args=sample_args)


if __name__ == "__main__":
    main()
