"""python -m qbot_tpu FILE — module entry point."""
from qbot_tpu import main

if __name__ == "__main__":
    main()
