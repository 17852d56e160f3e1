"""Command-line interface.

Flag and behavior parity with the reference entry points
(reference: ribodetector/detect.py:763-809 and detect_cpu.py:776-825):
-c/--config, -d/--deviceid, -l/--len, -i/--input, -o/--output, -r/--rrna,
-e/--ensure, -t/--threads, -m/--memory, --chunk_size, --log, -v/--version.

One binary replaces both `ribodetector` and `ribodetector_cpu`: the engine
targets whatever backend JAX selects (TPU when available, else CPU), so there
is no split CLI. TPU-specific additions: --semantics {dense,packed} picks the
reference path to reproduce (ONNX/dense vs cuDNN/packed, SURVEY.md 3.4) and
--kernel {auto,scan,pallas} selects the compute kernel.
"""

import argparse
import os
from argparse import RawTextHelpFormatter

from ribodetector_tpu import __version__
from ribodetector_tpu.config import DEFAULT_CONFIG, ConfigParser


def build_arg_parser():
    args = argparse.ArgumentParser(
        description="rRNA sequence detector (TPU-native)",
        formatter_class=RawTextHelpFormatter,
    )
    args.add_argument("-c", "--config", default=None, type=str,
                      help="Path of config file")
    args.add_argument("-d", "--deviceid", default=None, type=str,
                      help="Device selector forwarded to JAX (e.g. index of the TPU chip to use). (default: all)")
    args.add_argument("-l", "--len", type=int, required=True,
                      help="Sequencing read length. Note: the accuracy reduces for reads shorter than 40.")
    args.add_argument("-i", "--input", default=None, type=str, nargs="*", required=True,
                      help="Path of input sequence files (fasta and fastq), the second file will be considered as second end if two files given.")
    args.add_argument("-o", "--output", default=None, type=str, nargs="*", required=True,
                      help="Path of the output sequence files after rRNAs removal (same number of files as input). \n(Note: 2 times slower to write gz files)")
    args.add_argument("-r", "--rrna", default=None, type=str, nargs="*",
                      help="Path of the output sequence file of detected rRNAs (same number of files as input)")
    args.add_argument("-e", "--ensure", default="none", type=str,
                      choices=["rrna", "norrna", "both", "none"],
                      help="""Ensure which classification has high confidence for paired end reads.
norrna: output only high confident non-rRNAs, the rest are classified as rRNAs;
rrna: vice versa, only high confident rRNAs are classified as rRNA and the rest output as non-rRNAs;
both: both non-rRNA and rRNA prediction with high confidence;
none: give label based on the mean probability of read pair.
      (Only applicable for paired end reads, discard the read pair when their predictions are discordant)""")
    args.add_argument("-t", "--threads", default=10, type=int,
                      help="Number of host threads to use. (default: 10)")
    args.add_argument("-m", "--memory", default=32, type=int,
                      help="Amount (GB) of device RAM for batch sizing. (default: 32)\nHost-side note: the native streaming path additionally keeps a pool of\n~12 parse windows (sized from chunk records; doubled for paired input)\nplus up to -t+4 compression scratch buffers in flight -- typically a few\nhundred MB of host RAM on top of the chunk itself.")
    args.add_argument("--chunk_size", default=None, type=int,
                      help="Use this parameter when having low memory. Parsing the file in chunks.\n{}.\n{}.".format(
                          "Not needed when free RAM >=5 * your_file_size (uncompressed, sum of paired ends)",
                          "When chunk_size=256, memory=16 it will load 256 * 16 * 1024 reads each chunk",
                      ))
    args.add_argument("--log", default=None, type=str, help="Log file name")
    args.add_argument("--profile", action="store_true",
                      help="Log per-stage wall-time breakdown (parse/encode/infer/write) at the end of the run")
    args.add_argument("--trace-dir", default=None, type=str,
                      help="Capture a jax.profiler trace of the run into this directory (TensorBoard/Perfetto)")
    args.add_argument("--resume", action="store_true",
                      help="Restartable streaming: after each completed chunk, record every output's\nbyte offset in <output>.progress.json; an interrupted run truncates the\noutputs to the last completed offset and continues from there.\n(native path)")
    args.add_argument("--semantics", default=None, type=str,
                      choices=["dense", "packed"],
                      help="Recurrence/gather semantics to reproduce: dense = reference CPU/ONNX path,\npacked = reference GPU/cuDNN PackedSequence path. (default: config value, dense)")
    args.add_argument("--kernel", default=None, type=str,
                      choices=["auto", "scan", "pallas"],
                      help="Compute kernel: Pallas fused TPU kernel, XLA scan, or auto. (default: auto)")
    args.add_argument("--precision", default=None, type=str,
                      choices=["exact", "high", "fast"],
                      help="""MXU precision of the Pallas kernel:
exact: full fp32 emulation, bit-identical to the XLA scan reference;
high:  2-limb-split fp32 fused into one MXU launch per step + tanh-form
       sigmoid, ~2.2x faster than exact; argmax flips confined to reads in
       the fp32 noise class (logit margin < 1e-3, ~3e-5 of worst-case
       random reads; the reference's own cuDNN and onnxruntime engines
       disagree with each other on such reads too) (default);
fast:  one bf16 pass, fastest, ~0.2%% of borderline reads may flip label""")
    args.add_argument("--buckets", default=None, type=str,
                      help="Length-bucketed batching for variable-length reads: auto (64-step\npadded-T grid up to -l; each read runs the smallest fitting bucket with\nexact full-length semantics via a precomputed backward-carry init), off,\nor a comma list of bucket lengths. (default: auto)")
    args.add_argument("--gz-level", default=None, type=int, choices=range(1, 13),
                      metavar="{1..12}",
                      help="libdeflate compression level for gz outputs on the native path\n(default 3 = the reference's zlib-level-5 ratio at ~3.5x the speed;\n1 = ~2x faster deflate at ~4%% worse ratio -- use when the write stage\nbottlenecks, e.g. many gz outputs on few cores).")
    args.add_argument("--hosts", default=1, type=int,
                      help="Shard the input stream over N cooperating hosts: each host classifies\nits round-robin share of the chunks and writes per-host output shards\n(<name>.hostNNN; gz shards concatenate into a valid gz file).\nRun once per host with a distinct --host-id. (default: 1)")
    args.add_argument("--host-id", default=0, type=int,
                      help="This process's shard index in [0, --hosts). (default: 0)")
    args.add_argument("--coordinator", default=None, type=str,
                      help="host:port of host 0 -- turns the --hosts mode into a coordinated\njax.distributed run: global summary counts are psum-merged over DCN and\nhost 0 concatenates all per-host shards into the final outputs\n(shared filesystem assumed). Requires --num-hosts and --host-id.")
    args.add_argument("--num-hosts", default=None, type=int,
                      help="Total number of cooperating processes for --coordinator mode.")
    args.add_argument("--barrier-timeout", default=3600, type=int,
                      help="Seconds to wait at the end-of-run coordination barrier in\n--coordinator mode before failing with a clear error (a cooperating\nhost likely died; per-chunk parts stay on disk). (default: 3600)")
    args.add_argument("-v", "--version", action="version",
                      version="%(prog)s {version}".format(version=__version__))
    return args


def honor_env_platforms():
    """Honor an explicit JAX_PLATFORMS (e.g. =cpu) even when a TPU plugin's
    sitecustomize has overridden platform selection. Shared by every entry
    point (detect, train)."""
    if os.environ.get("JAX_PLATFORMS"):
        import jax

        try:
            jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
        except Exception:
            pass


def main(argv=None):
    args = build_arg_parser().parse_args(argv)
    honor_env_platforms()
    if args.deviceid is not None:
        # restrict visible TPU chips, analogous to CUDA_VISIBLE_DEVICES
        # gating in the reference (detect.py:90-91). Must take effect before
        # jax initializes; fail loudly instead of silently classifying on
        # the wrong chips if it cannot.
        prev = os.environ.get("TPU_VISIBLE_DEVICES")
        if prev is not None and prev != args.deviceid:
            raise SystemExit(
                f"--deviceid {args.deviceid} conflicts with "
                f"TPU_VISIBLE_DEVICES={prev} already set in the environment; "
                "unset one of them."
            )
        try:
            import jax._src.xla_bridge as xb

            backend_live = bool(getattr(xb, "_backends", None))
        except Exception:  # pragma: no cover - private API moved
            backend_live = False
        if backend_live:
            raise SystemExit(
                "--deviceid was given after the JAX backend already "
                "initialized in this process; it cannot take effect. Set "
                "TPU_VISIBLE_DEVICES in the environment instead."
            )
        os.environ["TPU_VISIBLE_DEVICES"] = args.deviceid
    if args.coordinator is not None:
        # multi-host runtime (SURVEY.md 5 "Distributed communication
        # backend"): one coordinated jax.distributed process group; must run
        # before any backend initialization
        if not args.num_hosts or args.num_hosts < 2:
            raise SystemExit("--coordinator requires --num-hosts >= 2")
        import jax

        jax.distributed.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_hosts,
            process_id=args.host_id,
        )
        args.hosts = jax.process_count()
        args.host_id = jax.process_index()
    config_file = args.config if args.config is not None else DEFAULT_CONFIG
    config = ConfigParser.from_json(config_file)
    if args.kernel is not None:
        config.config.setdefault("runtime", {})["kernel"] = args.kernel

    from ribodetector_tpu.runtime import Predictor

    seq_pred = Predictor(config, args)
    seq_pred.load_model()
    seq_pred.detect()


def main_cpu(argv=None):
    """`ribodetector_cpu` parity entry point (reference:
    detect_cpu.py:776-825): the same single engine PINNED to the host CPU
    backend -- unconditionally, like the reference's CPU runtime; an
    inherited JAX_PLATFORMS must not reroute the 'CPU' command onto an
    accelerator. The reference needed a whole second runtime for CPUs;
    here only the platform changes -- dense/ONNX semantics are already the
    default, outputs stay deterministic (the reference CPU path is
    completion-order nondeterministic, SURVEY.md 5)."""
    os.environ["JAX_PLATFORMS"] = "cpu"
    main(argv)


if __name__ == "__main__":
    main()
