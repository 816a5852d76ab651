"""paftools port (reference misc/paftools.js). Subcommands land incrementally:
sam2paf, mapeval, junceval, call are the self-evaluation core (SURVEY.md #32)."""
import sys


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    if not argv:
        print("Usage: paftools-py <command> [args]\ncommands: sam2paf mapeval", file=sys.stderr)
        return 1
    cmd = argv[0]
    if cmd == "sam2paf":
        from .sam2paf import sam2paf_main
        return sam2paf_main(argv[1:])
    if cmd == "mapeval":
        from .mapeval import mapeval_main
        return mapeval_main(argv[1:])
    print(f"unknown command: {cmd}", file=sys.stderr)
    return 1


if __name__ == "__main__":
    sys.exit(main())
