"""Download the real all-MiniLM-L6-v2 checkpoint for the MiniLM embedder.

Requires network egress (this build environment has none — run it wherever the
framework is deployed). The reference ships the compiled CoreML model inside the
package (Sources/WaxVectorSearchMiniLM/Resources/); we keep weights out of the repo
and load the public HuggingFace checkpoint instead:

    python scripts/fetch_minilm.py [--dest ~/.wax-tpu/models/all-MiniLM-L6-v2]

then either pass checkpoint_dir=... to MiniLMEmbedder, or set WAX_TPU_MINILM_DIR.
After the first download, run the drift check:

    pytest tests/test_minilm_golden.py::TestRealGolden -q
(the first run captures a minilm_real_golden.json fixture under tests/fixtures/,
later runs compare against it).
"""
import argparse
import pathlib
import sys

FILES = [
    "model.safetensors",
    "config.json",
    "vocab.txt",
    "tokenizer_config.json",
]
REPO = "sentence-transformers/all-MiniLM-L6-v2"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--dest",
        default=str(pathlib.Path.home() / ".wax-tpu" / "models" / "all-MiniLM-L6-v2"),
    )
    args = ap.parse_args()
    dest = pathlib.Path(args.dest)
    dest.mkdir(parents=True, exist_ok=True)
    try:
        from huggingface_hub import hf_hub_download
    except ImportError:
        print("huggingface_hub not installed; pip install huggingface_hub", file=sys.stderr)
        return 1
    for f in FILES:
        try:
            p = hf_hub_download(repo_id=REPO, filename=f, local_dir=str(dest))
            print("fetched", p)
        except Exception as e:  # noqa: BLE001
            print(f"FAILED {f}: {e}", file=sys.stderr)
            return 1
    print(f"done. Set WAX_TPU_MINILM_DIR={dest} or pass checkpoint_dir to MiniLMEmbedder.")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
