"""Provisioning CLI — the analog of scripts/download_pretrain_weights.py.

Fetches (when the network allows) and converts the reference CosyVoice2
artifacts into native .npz pytrees, and assembles the transfer-learning
starting checkpoint:

  python -m jyutvoice_tpu.cli.provision --download --assemble-pretrain
  python -m jyutvoice_tpu.cli.provision --flow-pt pretrained_models/flow.pt \
      --hift-pt pretrained_models/hift.pt --assemble-pretrain

Then start the frozen-decoder fine-tune (reference train.py):

  python -m jyutvoice_tpu.cli.train --dataset <dir> \
      --pretrain pretrained_models_tpu/tts_init.npz
"""

from __future__ import annotations

import argparse
import logging

log = logging.getLogger("jyutvoice_tpu.provision")


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Convert / download JyutVoice pretrained weights"
    )
    parser.add_argument("--flow-pt", default=None, help="CosyVoice2 flow.pt")
    parser.add_argument("--hift-pt", default=None, help="CosyVoice2 hift.pt")
    parser.add_argument("--tts-ckpt", default=None,
                        help="full JyutVoiceTTS torch checkpoint")
    parser.add_argument("--campplus-onnx", default=None,
                        help="campplus.onnx -> native campplus.npz")
    parser.add_argument("--tokenizer-torch", default=None,
                        help="speech_tokenizer_v2 torch ckpt -> s3_tokenizer.npz")
    parser.add_argument("--out-dir", default="pretrained_models_tpu")
    parser.add_argument("--download", action="store_true",
                        help="fetch missing artifacts from HuggingFace "
                             "(skips gracefully offline)")
    parser.add_argument("--download-dir", default="pretrained_models")
    parser.add_argument("--assemble-pretrain", action="store_true",
                        help="also write tts_init.npz: random init + frozen "
                             "CosyVoice2 decoder (reference pretrain.pt)")
    parser.add_argument("--seed", type=int, default=42,
                        help="seed for the random (trainable) half of "
                             "tts_init.npz")
    parser.add_argument("--export-torch", nargs=2, metavar=("NPZ", "CKPT"),
                        default=None,
                        help="reverse interop: convert a trained tts .npz "
                             "back to a reference-loadable torch .ckpt")
    parser.add_argument("--verify", action="store_true",
                        help="end-to-end real-weight verification: strict "
                             "key-coverage audit -> convert -> synthesize "
                             "the BASELINE config-1 sentence -> print xRT "
                             "(+ mel MAE with --reference-mel)")
    parser.add_argument("--reference-mel", default=None,
                        help="stored reference mel dump (.npy, (T,80)) to "
                             "compare against during --verify")
    parser.add_argument("--verify-text", default=None,
                        help="override the --verify sentence")
    parser.add_argument("--verify-lang", default="en")
    parser.add_argument("--verify-phone", default=None)
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    from jyutvoice_tpu.weights.provision import provision

    if args.verify:
        from jyutvoice_tpu.weights.provision import verify

        kwargs = {}
        if args.verify_text:
            kwargs["text"] = args.verify_text
        return verify(
            flow_pt=args.flow_pt,
            hift_pt=args.hift_pt,
            tts_ckpt=args.tts_ckpt,
            out_dir=args.out_dir,
            lang=args.verify_lang,
            phone=args.verify_phone,
            reference_mel=args.reference_mel,
            download=args.download,
            download_dir=args.download_dir,
            **kwargs,
        )

    if args.export_torch:
        from jyutvoice_tpu.weights.provision import load_pytree_npz
        from jyutvoice_tpu.weights.torch_export import save_torch_checkpoint

        npz_path, ckpt_path = args.export_torch
        save_torch_checkpoint(ckpt_path, load_pytree_npz(npz_path))
        log.info("exported %s -> %s (reference-loadable)", npz_path, ckpt_path)
        return {"torch_ckpt": ckpt_path}

    written = provision(
        flow_pt=args.flow_pt,
        hift_pt=args.hift_pt,
        tts_ckpt=args.tts_ckpt,
        campplus_onnx=args.campplus_onnx,
        tokenizer_torch=args.tokenizer_torch,
        out_dir=args.out_dir,
        assemble_pretrain=args.assemble_pretrain,
        seed=args.seed,
        download=args.download,
        download_dir=args.download_dir,
    )
    if not written:
        log.warning(
            "nothing provisioned: pass --flow-pt/--hift-pt/--tts-ckpt or "
            "--download"
        )
    for name, path in written.items():
        log.info("%s -> %s", name, path)
    return written


if __name__ == "__main__":
    main()
