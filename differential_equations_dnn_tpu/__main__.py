from differential_equations_dnn_tpu.cli import main

if __name__ == "__main__":
    main()
