from scream_tpu.cli import main

main()
