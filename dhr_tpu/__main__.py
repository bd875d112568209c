from dhr_tpu.cli.main import main

main()
