from ciff_ray.cli import main

main()
