from setuptools import setup, find_packages
setup(name="datapipeline-dags-spark", version="0.1.0", packages=find_packages())
