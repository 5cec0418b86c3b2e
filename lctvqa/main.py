"""CLI entry point (reference `basic_vqa/main.py`).

    python -m lctvqa.main --arch_type darts --exp my_exp --input_dir ...

Flags mirror the reference plus TPU-native extras (architect mode, compute
dtype, mesh size).
"""

from __future__ import annotations

import argparse
import dataclasses

from lctvqa.config import Config, DataConfig, MeshConfig, ModelConfig, \
    TrainConfig


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="LCT-VQA (TPU-native)")
    p.add_argument("--w_lambda", type=float, default=1.0)
    p.add_argument("--num_epochs", type=int, default=30)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--train_portion", type=float, default=1.0)
    p.add_argument("--exp", type=str, default="default_exp")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--input_dir", type=str, default="data/vqa/hdf5_64")
    p.add_argument("--num_workers", type=int, default=8)
    p.add_argument("--arch_type", type=str, default="darts",
                   choices=["fixed", "darts", "derived"])
    p.add_argument("--arch_update_freq", type=int, default=2000)
    p.add_argument("--skip_stage2", action="store_true")
    p.add_argument("--skip_stage3", action="store_true")
    p.add_argument("--no_pretrain_enc", action="store_true")
    p.add_argument("--use_old_dataloader", action="store_true",
                   help="v1 npy-record loader instead of the hdf5 loader "
                        "(basic_vqa/data_factory.py:5-23)")
    p.add_argument("--img_size", type=int, default=64)
    p.add_argument("--seed", type=int, default=10)
    p.add_argument("--bn_eval_stats", action="store_true",
                   help="track BN running stats in training and use them "
                        "in validation (reference model.eval() numerics)")
    p.add_argument("--preload_images", type=str, default="auto",
                   choices=["auto", "ram", "lazy"],
                   help="image residency: RAM, chunked h5 reads, or auto")
    # TPU-native extras
    p.add_argument("--architect_mode", type=str, default="exact-indirect",
                   choices=["exact", "exact-indirect", "fd"])
    p.add_argument("--stage3_remat", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="jax.checkpoint the tri-level architect's inner "
                        "unroll losses (default ON: faster AND smaller at "
                        "reference dims; see config.py)")
    p.add_argument("--fuse_mixed_ops", action="store_true",
                   help="edge-batched mixed-op execution "
                        "(models/search_fused.py)")
    p.add_argument("--no_fold_bn", action="store_true",
                   help="explicit per-op BN instead of the folded mixture")
    p.add_argument("--remat_cells", action="store_true",
                   help="rematerialize DARTS cells in the bwd pass "
                        "(memory over speed; see config.py)")
    p.add_argument("--pack_conv_branches", action="store_true",
                   help="packed depthwise-separable mixed-op branches "
                        "(measured slower on v5e; see config.py)")
    p.add_argument("--pallas_mixed_op", action="store_true",
                   help="Pallas whole-edge mixed-op kernel in an HWCN "
                        "trunk (see config.py for measured numbers)")
    # defaults track ModelConfig so a measured default flip is one line
    _m = ModelConfig()
    p.add_argument("--pallas_generate",
                   action=argparse.BooleanOptionalAction,
                   default=_m.pallas_generate,
                   help="whole-loop fused Pallas greedy decode "
                        "(ops/pallas_generate.py)")
    p.add_argument("--pallas_seq_lstm",
                   action=argparse.BooleanOptionalAction,
                   default=_m.pallas_seq_lstm,
                   help="whole-sequence fused LSTM for the question "
                        "encoders (ops/pallas_lstm.py)")
    p.add_argument("--compute_dtype", type=str, default="bfloat16")
    p.add_argument("--num_devices", type=int, default=0,
                   help="0 = all local devices")
    p.add_argument("--multihost", action="store_true",
                   help="multi-host DP: jax.distributed.initialize() + "
                        "global mesh over all processes' devices")
    p.add_argument("--coordinator_address", type=str, default="",
                   help="host:port of process 0 (multihost; empty = "
                        "TPU-pod autodetect)")
    p.add_argument("--num_processes", type=int, default=0)
    p.add_argument("--process_id", type=int, default=-1)
    p.add_argument("--vgg_weights", type=str, default="",
                   help="path to a torch vgg19 state_dict for pretrained "
                        "encoder init")
    # experiment family: 'lct' = 3-stage basic_vqa loop; 'darts' = 2-stage
    # darts_vqa loop; 'unified' = darts_vqa qa-stream variant
    p.add_argument("--tiny", action="store_true",
                   help="shrink model dims for debugging/smoke tests")
    p.add_argument("--package", type=str, default="lct",
                   choices=["lct", "darts", "unified"])
    p.add_argument("--qst_only", action="store_true",
                   help="question-only loss (darts package)")
    p.add_argument("--genotype", type=str, default="",
                   help="genotype for --arch_type derived: a preset name "
                        "(e.g. PC_DARTS_cifar, DARTS_V2), a search "
                        "checkpoint path (arch decoded on the spot), or a "
                        "text file with a Genotype(...) repr")
    return p


def config_from_args(args) -> Config:
    genotype = None
    if getattr(args, "genotype", ""):
        from lctvqa.genotype import resolve_genotype
        genotype = resolve_genotype(args.genotype)
    model = ModelConfig(arch_type=args.arch_type,
                        pretrained_enc=not args.no_pretrain_enc,
                        img_size=args.img_size,
                        compute_dtype=args.compute_dtype,
                        genotype=genotype,
                        bn_eval_stats=args.bn_eval_stats,
                        fuse_mixed_ops=args.fuse_mixed_ops,
                        fold_bn_mixture=not args.no_fold_bn,
                        remat_cells=args.remat_cells,
                        pack_conv_branches=args.pack_conv_branches,
                        pallas_mixed_op=args.pallas_mixed_op,
                        pallas_generate=args.pallas_generate,
                        pallas_seq_lstm=args.pallas_seq_lstm)
    if args.tiny:
        model = dataclasses.replace(
            model, img_embed_size=16, word_embed_size=8,
            lstm_hidden_size=16, max_qst_len=8, darts_init_ch=4,
            darts_layers=1, darts_steps=2, darts_multiplier=2,
            vgg_width_mult=1 / 16, vgg_fc_dim=32)
    if genotype is not None:
        # cell shape is dictated by the genotype being retrained
        model = dataclasses.replace(
            model, darts_steps=len(genotype.normal) // 2,
            darts_multiplier=len(genotype.normal_concat))
    train = TrainConfig(
        w_lambda=args.w_lambda, num_epochs=args.num_epochs,
        batch_size=args.batch_size, train_portion=args.train_portion,
        arch_update_freq=args.arch_update_freq,
        skip_stage2=args.skip_stage2, skip_stage3=args.skip_stage3,
        seed=args.seed, architect_mode=args.architect_mode,
        stage3_remat=args.stage3_remat,
        report_freq=10 if args.arch_type == "darts" else 100)
    data = DataConfig(input_dir=args.input_dir,
                      num_workers=args.num_workers,
                      use_old_dataloader=args.use_old_dataloader,
                      preload_images=args.preload_images)
    mesh = MeshConfig(num_devices=args.num_devices,
                      multihost=args.multihost)
    return Config(model=model, train=train, data=data, mesh=mesh,
                  exp_name=args.exp, resume=args.resume)


def main(argv=None):
    args = build_parser().parse_args(argv)
    cfg = config_from_args(args)

    if args.multihost:
        # must run before any other jax API touches the backend
        from lctvqa.parallel import distributed
        distributed.initialize(
            coordinator_address=args.coordinator_address or None,
            num_processes=args.num_processes or None,
            process_id=args.process_id if args.process_id >= 0 else None)

    # vocab sizes come from the dataset on disk
    from lctvqa.text import VocabDict
    import os
    qst_vocab = VocabDict(os.path.join(args.input_dir,
                                       "vocab_questions.txt"))
    ans_vocab = VocabDict(os.path.join(args.input_dir,
                                       "vocab_answers.txt"))
    cfg = cfg.replace(model=dataclasses.replace(
        cfg.model, qst_vocab_size=qst_vocab.vocab_size,
        ans_vocab_size=ans_vocab.vocab_size))

    vgg_params = None
    if args.vgg_weights:
        from lctvqa.models.vgg import load_pretrained
        vgg_params = load_pretrained(args.vgg_weights)

    if args.package == "lct":
        from lctvqa.train.experiment import Experiment
        exp = Experiment(cfg, vgg_params=vgg_params)
    elif args.package == "darts":
        from lctvqa.train.experiment_darts import DartsExperiment
        exp = DartsExperiment(cfg, qst_only=args.qst_only)
    else:
        from lctvqa.train.experiment_darts import DartsExperimentUnified
        exp = DartsExperimentUnified(cfg)
    exp.run()


if __name__ == "__main__":
    main()
