// Test-only shim: the serial oracle harness never spawns boost threads;
// sequencestorage.hh includes this header but only uses boost::mutex.
#ifndef TAXTK_SHIM_BOOST_THREAD_THREAD_HPP
#define TAXTK_SHIM_BOOST_THREAD_THREAD_HPP
#include "mutex.hpp"
#endif
