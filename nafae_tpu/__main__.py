"""Top-level CLI dispatcher: python -m nafae_tpu {train,eval,extract,convert}."""

import sys


def main():
    cmds = {
        "train": "nafae_tpu.train",
        "eval": "nafae_tpu.evaluate",
        "extract": "nafae_tpu.extract",
        "convert": "nafae_tpu.utils.torch_convert",
        "visualize": "nafae_tpu.visualize",
        "serve": "nafae_tpu.serve",
    }
    if len(sys.argv) < 2 or sys.argv[1] not in cmds:
        print(f"usage: python -m nafae_tpu {{{','.join(cmds)}}} [args...]",
              file=sys.stderr)
        return 2
    import importlib
    mod = importlib.import_module(cmds[sys.argv[1]])
    return mod.main(sys.argv[2:])


if __name__ == "__main__":
    sys.exit(main())
